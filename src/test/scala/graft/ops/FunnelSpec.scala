package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
  private val steps = Seq("a", "b", "c")

  test("strict order: a step BEFORE the previous one completed does not count") {
    val ev = Seq(
      // user 1: b happens before a -> only that later b counts... none
      // exists, so user 1 stops at step 1 (the a at t2)
      (1L, "b", ts(1)), (1L, "a", ts(2)),
      // user 2: clean a -> b -> c
      (2L, "a", ts(1)), (2L, "b", ts(2)), (2L, "c", ts(3)),
      // user 3: c first, then a, then b: reaches 2 (a@2, b@3), the
      // early c never counts
      (3L, "c", ts(1)), (3L, "a", ts(2)), (3L, "b", ts(3)),
      // user 4: no step-a at all -> absent from output
      (4L, "b", ts(1)), (4L, "c", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.userFunnel(ev, "user_id", "event_type", "ts", steps)
      .select("user_id", "steps_completed", "t_first", "t_done")
      .as[(Long, Int, Timestamp, Timestamp)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(4L))
    assert(got(1L) === ((1L, 1, ts(2), ts(2))))
    assert(got(2L) === ((2L, 3, ts(1), ts(3))))
    assert(got(3L) === ((3L, 2, ts(2), ts(3))))
  }

  test("same-timestamp tie: the later step at the SAME instant counts (>= semantics)") {
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(1)), (1L, "c", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.userFunnel(ev, "user_id", "event_type", "ts", steps)
      .select("user_id", "steps_completed").as[(Long, Int)].collect().toMap
    assert(got(1L) === 3)
  }

  test("conversion: hand-checked per-step users and rates") {
    val ev = Seq(
      (1L, "a", ts(1)), (1L, "b", ts(2)), (1L, "c", ts(3)),
      (2L, "a", ts(1)), (2L, "b", ts(2)),
      (3L, "a", ts(1)),
      (4L, "a", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.conversion(ev, "user_id", "event_type", "ts", steps)
      .select("step", "step_name", "users", "conv_rate")
      .as[(Int, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1, "a", 4L, 1.0), (2, "b", 2L, 0.5), (3, "c", 1L, 0.25)))
  }

  test("cohort retention: hand-checked cohorts, offsets and rates; offset 0 is the full cohort") {
    def day(d: Int, h: Int = 3) = new Timestamp((d * 86400L + h * 3600L) * 1000L)
    val ev = Seq(
      // cohort day 0: users 1,2. user 1 active days 0,1,2; user 2 days 0,2
      (1L, day(0)), (1L, day(1)), (1L, day(2)),
      (2L, day(0)), (2L, day(2)),
      // cohort day 1: user 3, active days 1 and 3
      (3L, day(1)), (3L, day(3)),
      // multiple events same day collapse
      (1L, day(0, 5))
    ).toDF("user_id", "ts")
    val got = Cohorts.retention(ev, "user_id", "ts")
      .select("cohort_day", "day_offset", "n_active", "cohort_size", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got((0L, 0L)) === ((2L, 2L, 1.0)))
    assert(got((0L, 1L)) === ((1L, 2L, 0.5)))
    assert(got((0L, 2L)) === ((2L, 2L, 1.0)))
    assert(got((1L, 0L)) === ((1L, 1L, 1.0)))
    assert(got((1L, 2L)) === ((1L, 1L, 1.0)))
    assert(!got.contains((1L, 1L))) // user 3 inactive on day 2
    assert(got.size === 5)
  }

  test("fold is partition-invariant (event arrival order never matters)") {
    val ev = graft.util.Tables.events(spark, sf)
    def run(parts: Int) = Funnel
      .userFunnel(ev.repartition(parts), "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .orderBy("user_id").collect().toSeq
    assert(run(1) === run(7))
  }

  test("Cohorts.ltv: hand curve — fixed cohort denominator, exact cents") {
    import java.sql.Timestamp
    import java.time.Instant
    def ts(day: Long) = Timestamp.from(Instant.ofEpochSecond(day * 86400 + 10))
    // cohort day 0: users u1, u2. u1 buys 1.50 on d0 and 2.50 on d2; u2 buys 1.00 on d0
    val df = Seq(
      ("u1", ts(0), 1.50), ("u2", ts(0), 1.00), ("u1", ts(2), 2.50)
    ).toDF("u", "t", "rev")
    val got = Cohorts.ltv(df, "u", "t", "rev").orderBy("age").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("age") === 0L)
    assert(got(0).getAs[Long]("cohort_size") === 2L)
    assert(got(0).getAs[Long]("rev_cents") === 250L)
    assert(got(0).getAs[Double]("cum_rev_per_user") === 1.25)
    assert(got(1).getAs[Long]("age") === 2L)
    assert(got(1).getAs[Long]("cum_rev_cents") === 500L)
    // denominator stays the FULL cohort (2 users) even though only u1 is active
    assert(got(1).getAs[Double]("cum_rev_per_user") === 2.5)
  }
}
