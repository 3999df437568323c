package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpliftSpec extends SparkSpec {
  import spark.implicits._

  // 8 units, 2 buckets of 4, scores descending 8..1 (unique — total
  // order), planted so the hand numbers below are exact:
  //   bucket 1 (top 4):    (t,y) = (1,1),(1,0),(0,0),(0,0)
  //   bucket 2 (bottom 4): (t,y) = (1,1),(1,1),(0,1),(0,0)
  private def planted = Seq(
    (1L, 1, 1, 8.0), (2L, 1, 0, 7.0), (3L, 0, 0, 6.0), (4L, 0, 0, 5.0),
    (5L, 1, 1, 4.0), (6L, 1, 1, 3.0), (7L, 0, 1, 2.0), (8L, 0, 0, 1.0)
  ).toDF("id", "t", "y", "s")

  test("qiniDeciles: hand-checked two-bucket curve") {
    val got = Uplift.qiniDeciles(planted, "t", "y", "s", "id", buckets = 2)
      .orderBy("bucket").collect()
    assert(got.length === 2)
    val b1 = got(0)
    assert(b1.getAs[Int]("bucket") === 1)
    assert(b1.getAs[Long]("n") === 4L)
    assert(b1.getAs[Long]("nt") === 2L && b1.getAs[Long]("nc") === 2L)
    assert(b1.getAs[Long]("rt") === 1L && b1.getAs[Long]("rc") === 0L)
    // cum: nt=2 nc=2 rt=1 rc=0 -> uplift 1/2-0/2 = .5; qini = 1 - 0*2/2 = 1
    assert(b1.getAs[Double]("uplift_at_k") === 0.5)
    assert(b1.getAs[Double]("qini") === 1.0)
    val b2 = got(1)
    // cum: nt=4 nc=4 rt=3 rc=1 -> uplift 3/4-1/4 = .5; qini = 3 - 1*4/4 = 2
    assert(b2.getAs[Double]("uplift_at_k") === 0.5)
    assert(b2.getAs[Double]("qini") === 2.0)
    // random line: qini_total=2; bucket 1 at cum_n/N = 1/2 -> 1; bucket 2 -> 2
    assert(got(0).getAs[Double]("random_qini") === 1.0)
    assert(got(1).getAs[Double]("random_qini") === 2.0)
  }

  test("qiniDeciles: control-free prefix yields null qini, not a crash") {
    // top bucket all-treated: size adjustment undefined until a control arrives
    val df = Seq(
      (1L, 1, 1, 9.0), (2L, 1, 0, 8.0),
      (3L, 0, 1, 2.0), (4L, 1, 0, 1.0)
    ).toDF("id", "t", "y", "s")
    val got = Uplift.qiniDeciles(df, "t", "y", "s", "id", buckets = 2)
      .orderBy("bucket").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("qini")))
    assert(got(0).isNullAt(got(0).fieldIndex("uplift_at_k")))
    assert(!got(1).isNullAt(got(1).fieldIndex("qini")))
  }

  test("qiniDeciles: no unpartitioned WindowExec over the unit frame") {
    // windows may only appear AFTER the buckets-row aggregate; the unit
    // ranking must go through ops.Rank (range exchange, no global window)
    val plan = Uplift.qiniDeciles(planted, "t", "y", "s", "id", buckets = 2)
      .queryExecution.optimizedPlan
    var preAgg = false
    var sawAgg = false
    plan.foreachUp {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => sawAgg = true
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        if (!sawAgg && w.partitionSpec.isEmpty) preAgg = true
      case _ =>
    }
    assert(!preAgg, "global window must not run over the pre-aggregate unit frame")
  }
}
