package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Rank: exact global row_number / min-rank / ntile WITHOUT the
  * single-partition WindowExec, plus plan assertions that the five
  * former global-window operators (rfm, quantileMap, nnMatch, msprt,
  * psi) no longer plan ANY unpartitioned Window.
  */
class RankSpec extends SparkSpec {
  import spark.implicits._

  /** Unpartitioned logical Window nodes anywhere in the final plan.
    * (Pre-checkpoint passes are asserted by construction: Rank itself
    * plans no Window at all; the prefix consumers only use
    * Window.partitionBy(__pid).)
    */
  private def unpartitionedWindows(df: DataFrame): Seq[LWindow] =
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }

  private def refData =
    (1 to 257).map(i => ((i * 7919) % 101, s"id$i")).toDF("v", "id")

  test("withGlobalRowNumber matches single-partition row_number on a total order") {
    val df = refData
    val got = Rank.withGlobalRowNumber(df, "rn", Seq(col("v"), col("id")), numPartitions = 7)
    val want = df.withColumn("rn", row_number().over(Window.orderBy("v", "id")).cast("long"))
    assert(got.orderBy("rn").collect().toSeq == want.orderBy("rn").collect().toSeq)
    assert(unpartitionedWindows(got).isEmpty)
  }

  test("withGlobalMinRank matches rank() with ties") {
    val df = refData // v has heavy ties (101 distinct over 257 rows)
    val got = Rank.withGlobalMinRank(df, "rk", Seq(col("v")), Seq(col("id")), numPartitions = 5)
    val want = df.withColumn("rk", rank().over(Window.orderBy("v")).cast("long"))
    assert(
      got.select("v", "id", "rk").orderBy("v", "id").collect().toSeq ==
        want.select("v", "id", "rk").orderBy("v", "id").collect().toSeq)
  }

  test("withGlobalNtile matches ntile for n % k != 0, n % k == 0, and n < k") {
    for ((rows, k) <- Seq((257, 5), (100, 4), (3, 8))) {
      val df = (1 to rows).map(i => ((i * 7919) % 1009, s"id$i")).toDF("v", "id")
      val got = Rank.withGlobalNtile(df, "b", k, Seq(col("v"), col("id")), numPartitions = 6)
      val want = df.withColumn("b", ntile(k).over(Window.orderBy("v", "id")))
      assert(
        got.orderBy("v", "id").collect().toSeq == want.orderBy("v", "id").collect().toSeq,
        s"ntile($k) over $rows rows")
    }
  }

  test("descending sort keys rank correctly") {
    val df = (1 to 50).map(i => (i % 10, i)).toDF("v", "id")
    val got = Rank.withGlobalRowNumber(df, "rn", Seq(col("v").desc, col("id")), numPartitions = 3)
    val want = df.withColumn(
      "rn", row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    assert(got.orderBy("rn").collect().toSeq == want.orderBy("rn").collect().toSeq)
  }

  test("empty input yields empty output, no crash") {
    val df = Seq.empty[(Int, String)].toDF("v", "id")
    assert(Rank.withGlobalRowNumber(df, "rn", Seq(col("v"))).count() == 0L)
    assert(Rank.withGlobalNtile(df, "b", 5, Seq(col("v"))).count() == 0L)
  }

  // ---- the five former single-partition-window operators ---------------

  test("rfm plans no unpartitioned Window and scores every user 1-5") {
    val ev = (1 to 400).map { i =>
      (i % 37, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"), i * 1.5)
    }.toDF("user_id", "ts", "value")
    val out = Stats.rfm(ev, "user_id", "ts", "value")
    assert(unpartitionedWindows(out).isEmpty)
    val rows = out.collect()
    assert(rows.length == 37)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(rows.forall { r => val s = r.getAs[Int](c); s >= 1 && s <= 5 })
    // quintiles of 37 users: buckets sized 8,8,7,7,7
    val sizes = rows.groupBy(_.getAs[Int]("r_score")).view.mapValues(_.length).toMap
    assert(sizes == Map(1 -> 8, 2 -> 8, 3 -> 7, 4 -> 7, 5 -> 7))
  }

  test("quantileMap plans no unpartitioned Window; maps min->min, max->max") {
    val ref = (1 to 100).map(i => i.toDouble * 2).toDF("score")
    val cur = (1 to 57).map(i => (s"c$i", i.toDouble * 3 + 1)).toDF("id", "score")
    val out = Calibrate.quantileMap(ref, cur, "score", "id")
    assert(unpartitionedWindows(out).isEmpty)
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("c1") == 2.0)    // lowest current -> lowest reference value
    assert(m("c57") == 200.0) // highest -> highest
    assert(m.size == 57)
  }

  test("nnMatch plans no unpartitioned Window; matches nearest control exactly") {
    // controls at scores 0,10,20,...,90; treated at 3,17,44,88,95
    val controls = (0 until 10).map(i => (s"C$i", 0, i * 10.0, i * 1.0))
    val treated = Seq(("T0", 1, 3.0, 0.0), ("T1", 1, 17.0, 0.0), ("T2", 1, 44.0, 0.0),
      ("T3", 1, 88.0, 0.0), ("T4", 1, 95.0, 0.0))
    val df = (controls ++ treated).toDF("id", "tr", "sc", "y")
    val out = graft.ml.Causal.nnMatch(df, "id", "tr", "sc", "y", caliper = 100.0)
    assert(unpartitionedWindows(out).isEmpty)
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("T0" -> "C0", "T1" -> "C2", "T2" -> "C4", "T3" -> "C9", "T4" -> "C9"))
  }

  test("nnMatch cross-partition carry: lone early control matches far-later treated") {
    // with many partitions the single control lands partitions away from
    // every treated row — only the carry can supply it
    val rows = ("C", 0, 0.0, 7.0) +: (1 to 200).map(i => (s"T$i", 1, i * 1.0, 0.0))
    val out = graft.ml.Causal.nnMatch(
      rows.toDF("id", "tr", "sc", "y"), "id", "tr", "sc", "y", caliper = 1e9)
    val got = out.collect()
    assert(got.length == 200)
    assert(got.forall(r => r.getString(1) == "C" && r.getDouble(3) == 7.0))
  }

  test("msprt plans no unpartitioned Window; agrees with a driver-side replay") {
    val n = 600
    val ev = (1 to n).map { i =>
      val arm = if (i % 2 == 0) "A" else "B"
      val value = (i % 13).toDouble + (if (arm == "B") 1.0 else 0.0)
      (arm, value, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i)
    }.toDF("arm", "value", "ts", "tie")
    val out = Abtest.msprt(ev, col("arm"), col("value"), "ts", "tie",
      tau = 1.0, minPerArm = 30L, emitEvery = 100L)
    assert(unpartitionedWindows(out).isEmpty)
    val got = out.orderBy("at_event").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(100L, 200L, 300L, 400L, 500L, 600L))
    // sequential driver replay of the closed forms
    var (na, nb, sa, sb, qa, qb) = (0L, 0L, 0.0, 0.0, 0.0, 0.0)
    val expect = (1 to n).flatMap { i =>
      val arm = if (i % 2 == 0) "A" else "B"
      val v = (i % 13).toDouble + (if (arm == "B") 1.0 else 0.0)
      if (arm == "A") { na += 1; sa += v; qa += v * v }
      else { nb += 1; sb += v; qb += v * v }
      if (i % 100 == 0 && na >= 30 && nb >= 30) {
        val delta = sb / nb - sa / na
        val sig2 = (qa - sa * sa / na + (qb - sb * sb / nb)) / (na + nb - 2.0)
        val bigV = sig2 * (1.0 / na + 1.0 / nb)
        val lam = math.sqrt(bigV / (bigV + 1.0)) *
          math.exp(delta * delta / (2.0 * bigV * (bigV + 1.0)))
        Some((i.toLong, na, nb, delta, math.min(1.0, 1.0 / lam)))
      } else None
    }
    for ((r, e) <- got.zip(expect)) {
      assert(r.getLong(1) == e._2 && r.getLong(2) == e._3)
      assert(math.abs(r.getDouble(3) - e._4) < 2e-6, "delta")
      assert(math.abs(r.getDouble(4) - e._5) < 2e-6, "p_av")
    }
  }

  test("msprt with zero within-arm variance emits p_av = 1, not NaN") {
    val ev = (1 to 200).map { i =>
      (if (i % 2 == 0) "A" else "B", 5.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), i)
    }.toDF("arm", "value", "ts", "tie")
    val got = Abtest.msprt(ev, col("arm"), col("value"), "ts", "tie",
      minPerArm = 30L, emitEvery = 100L).orderBy("at_event").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getDouble(4) == 1.0))
  }

  test("liftTable and bhFdr plan no unpartitioned Window over row-scaled frames") {
    val scored = (1 to 300).map(i => (i.toLong, (i * 31 % 97).toDouble, i % 3 == 0))
      .toDF("id", "score", "label")
    val lift = graft.ml.Eval.liftTable(scored, "score", "label", Seq("id"))
    // the only window left is the bucket-cardinality cumsum: every
    // unpartitioned Window must sort on the post-aggregation bucket key,
    // never on the row-scaled score order
    val uw = unpartitionedWindows(lift)
    assert(uw.nonEmpty && uw.forall(_.orderSpec.forall(_.child.references.forall(
      a => a.name == "__bkt" || a.name == "bucket"))), uw.map(_.orderSpec).toString)
    val tests = (1 to 200).map(i =>
      (s"g$i", if (i <= 50) i * 1e-5 else 0.5 + i / 1000.0)).toDF("g", "p")
    val bh = graft.ml.Diagnostics.bhFdr(tests, "p", 0.05, Seq("g"))
    assert(unpartitionedWindows(bh).isEmpty)
    assert(bh.where(col("significant") === 1).count() == 50L)
  }

  test("psi plans no unpartitioned Window; identical distributions give psi ~ 0") {
    val ref = (1 to 1000).map(i => (i % 97).toDouble).toDF("x")
    val cur = (1 to 1000).map(i => (i % 97).toDouble).toDF("x")
    val out = Drift.psi(ref, cur, "x")
    assert(unpartitionedWindows(out).count(w => w.partitionSpec.isEmpty) <= 2) // 10-row total windows
    val rows = out.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getDouble(5) == 0.0))
    assert(rows.map(_.getLong(1)).sum == 1000L)
  }
}
