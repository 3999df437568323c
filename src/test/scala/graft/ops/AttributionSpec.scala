package graft.ops

import java.sql.Timestamp
import java.time.Instant

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = Timestamp.from(Instant.ofEpochSecond(sec))

  // u1: click@0, view@10, click@20 -> purchase@30 (k=3)
  // u2: purchase@50 with no touches (drops out)
  // u3: view@0, purchase@1000 with lookback 100 (touch outside window)
  private def events = Seq(
    (1L, ts(0L), "u1", "click"),
    (2L, ts(10L), "u1", "view"),
    (3L, ts(20L), "u1", "click"),
    (9L, ts(30L), "u1", "purchase"),
    (10L, ts(50L), "u2", "purchase"),
    (11L, ts(0L), "u3", "view"),
    (12L, ts(1000L), "u3", "purchase")
  ).toDF("id", "t", "u", "et")

  test("credit: hand-checked three-touch conversion, window filter, no-touch conversion drops") {
    val got = Attribution
      .credit(events, "u", "t", "et", "id", "purchase", Seq("click", "view"),
        lookbackSec = 100L, halfLifeSec = 10.0)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(got.keySet === Set("click", "view")) // u3's stale view filtered out
    val c = got("click"); val v = got("view")
    assert(c.getAs[Long]("touches") === 2L && v.getAs[Long]("touches") === 1L)
    assert(c.getAs[Long]("conversions") === 1L && v.getAs[Long]("conversions") === 1L)
    // linear: click 2/3, view 1/3
    assert(c.getAs[Double]("credit_linear") === 0.666667)
    assert(v.getAs[Double]("credit_linear") === 0.333333)
    // decay raws 2^-3, 2^-2, 2^-1 -> click (0.125+0.5)/0.875 = 5/7
    assert(c.getAs[Double]("credit_decay") === 0.714286)
    assert(v.getAs[Double]("credit_decay") === 0.285714)
    // position 40/20/40: click first+last = 0.8
    assert(c.getAs[Double]("credit_position") === 0.8)
    assert(v.getAs[Double]("credit_position") === 0.2)
    assert(c.getAs[Double]("credit_last") === 1.0 && v.getAs[Double]("credit_last") === 0.0)
    assert(c.getAs[Double]("credit_first") === 1.0 && v.getAs[Double]("credit_first") === 0.0)
  }

  test("credit: same-instant two-touch tie — ids split first/last, position 0.5/0.5") {
    val df = Seq(
      (5L, ts(10L), "u", "click"),
      (6L, ts(10L), "u", "view"),
      (7L, ts(20L), "u", "purchase")
    ).toDF("id", "t", "u", "et")
    val got = Attribution
      .credit(df, "u", "t", "et", "id", "purchase", Seq("click", "view"), 100L, 10.0)
      .collect().map(r => r.getAs[String]("channel") -> r).toMap
    // tid asc -> click(5) is first; tid desc -> view(6) is last
    assert(got("click").getAs[Double]("credit_first") === 1.0)
    assert(got("click").getAs[Double]("credit_last") === 0.0)
    assert(got("view").getAs[Double]("credit_last") === 1.0)
    assert(got("click").getAs[Double]("credit_position") === 0.5)
    assert(got("view").getAs[Double]("credit_position") === 0.5)
    // equal dt -> equal decay share
    assert(got("click").getAs[Double]("credit_decay") === 0.5)
  }

  test("credit: conversion type may not be a touch type") {
    intercept[IllegalArgumentException] {
      Attribution.credit(events, "u", "t", "et", "id", "purchase",
        Seq("purchase", "click"), 100L, 10.0)
    }
  }

  test("markovRemoval: hand chain — removal effects match the absorbing-chain algebra") {
    // u1: A -> conv ; u2: A -> B -> conv ; u3: B -> null ; u4: conv (no touches)
    // chain: start->A (2/4), start->B (1/4), start->conv (1/4)
    //        A->conv (1/2), A->B (1/2); B->conv (1/2), B->null (1/2)
    // p(B) = 1/2; p(A) = 1/2 + 1/2·p(B) = 3/4
    // p(start) = 1/2·(3/4) + 1/4·(1/2) + 1/4 = 3/4
    // remove A: p(start) = 1/4·(1/2) + 1/4 = 3/8  -> RE_A = (3/4-3/8)/(3/4) = 1/2
    // remove B: p(A) = 1/2; p(start) = 1/2·(1/2) + 1/4 = 1/2 -> RE_B = 1/3
    // shares over 5/6: A = 3/5, B = 2/5
    val events = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "purchase"),
      (2L, ts(0), 3L, "A"), (2L, ts(5), 4L, "B"), (2L, ts(10), 5L, "purchase"),
      (3L, ts(0), 6L, "B"),
      (4L, ts(0), 7L, "purchase")
    ).toDF("u", "t", "id", "et")
    val out = Attribution.markovRemoval(events, "u", "t", "et", "id",
      "purchase", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("A", "B"))
    assert(math.abs(out("A").getAs[Double]("p_conv") - 0.75) < 1e-6)
    assert(math.abs(out("A").getAs[Double]("removal_effect") - 0.5) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("removal_effect") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(out("A").getAs[Double]("share") - 0.6) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("share") - 0.4) < 1e-6)
    // a channel only on losing paths gets zero removal effect
    val ev2 = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "purchase"),
      (3L, ts(0), 6L, "B")
    ).toDF("u", "t", "id", "et")
    val o2 = Attribution.markovRemoval(ev2, "u", "t", "et", "id",
      "purchase", Seq("A", "B")).collect().map(r => r.getString(0) -> r).toMap
    assert(o2("B").getAs[Double]("removal_effect") === 0.0)
    assert(o2("A").getAs[Double]("removal_effect") === 1.0)
    // journeys cut at the FIRST conversion in (ts, id) order: a touch
    // after it contributes nothing
    val ev3 = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "purchase"), (1L, ts(20), 3L, "B")
    ).toDF("u", "t", "id", "et")
    val o3 = Attribution.markovRemoval(ev3, "u", "t", "et", "id",
      "purchase", Seq("A", "B")).collect().map(r => r.getString(0)).toSet
    assert(o3 === Set("A"))
  }

  test("path-model plans: cell joins broadcast, no cartesian blowup, user-keyed windows only") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    val events = (1 to 600).map { i =>
      (i.toLong % 40, ts(i), i.toLong,
        Seq("A", "B", "C", "purchase")(i % 4))
    }.toDF("u", "t", "id", "et")
    val sh = Attribution.shapley(events, "u", "t", "et", "id",
      "purchase", Seq("A", "B", "C"))
    val plan = sh.queryExecution.optimizedPlan
    // the only cross joins are the broadcast 1-row totals
    val crosses = plan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    assert(crosses.forall(_.hint.rightHint.exists(_.strategy.isDefined)),
      "unhinted cross join in the shapley plan")
    // no unpartitioned row-scaled window anywhere
    assert(plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.isEmpty)
    // csDid: every join over the (cohort, period) cell frame is broadcast
    val pan = (1 to 400).map(i => (s"u${i % 50}", (i % 8).toLong, i * 1.0,
      if (i % 3 == 0) 4L else 0L)).toDF("u", "t", "y", "g")
    val cs = graft.ml.Panel.csDid(pan, "u", "t", "y", "g")
    val joins = cs.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty && joins.forall(j =>
      j.hint.leftHint.exists(_.strategy.isDefined) ||
        j.hint.rightHint.exists(_.strategy.isDefined)),
      "csDid cell join without a broadcast hint")
  }

  test("shapley: collapsed permutation sum equals the direct Shapley formula on a hand game") {
    // u1: {A} conv; u2: {A,B} conv; u3: {B} no conv; u4: conv, no touches.
    // v({A})=1, v({B})=0, v({A,B})=1, v(∅)=0 (observed-coalition v).
    // Direct Shapley (n=2): φ_A = ½[v(A)−v(∅)] + ½[v(AB)−v(B)] = 1
    //                       φ_B = ½[v(B)−v(∅)] + ½[v(AB)−v(A)] = 0
    val events = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "purchase"),
      (2L, ts(0), 3L, "A"), (2L, ts(5), 4L, "B"), (2L, ts(10), 5L, "purchase"),
      (3L, ts(0), 6L, "B"),
      (4L, ts(0), 7L, "purchase")
    ).toDF("u", "t", "id", "et")
    val out = Attribution.shapley(events, "u", "t", "et", "id",
      "purchase", Seq("A", "B")).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("A", "B"))
    assert(math.abs(out("A").getAs[Double]("shapley") - 1.0) < 1e-9)
    assert(math.abs(out("B").getAs[Double]("shapley")) < 1e-9)
    assert(math.abs(out("A").getAs[Double]("share") - 1.0) < 1e-9)
    assert(out("A").getAs[Long]("n_sets") === 2L) // {A} and {A,B}
    assert(out("B").getAs[Long]("n_sets") === 2L) // {B} and {A,B}
    // order within the journey must NOT matter (set semantics):
    // reversing u2's touch order changes nothing
    val rev = Seq(
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "purchase"),
      (2L, ts(0), 3L, "B"), (2L, ts(5), 4L, "A"), (2L, ts(10), 5L, "purchase"),
      (3L, ts(0), 6L, "B"),
      (4L, ts(0), 7L, "purchase")
    ).toDF("u", "t", "id", "et")
    val o2 = Attribution.shapley(rev, "u", "t", "et", "id",
      "purchase", Seq("A", "B")).collect().map(r => r.getString(0) -> r.getAs[Double]("shapley")).toMap
    assert(o2 === out.view.mapValues(_.getAs[Double]("shapley")).toMap)
  }
}
