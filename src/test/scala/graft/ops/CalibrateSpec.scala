package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  test("percentileWithin: hand-checked ranks, tie sharing, per-group isolation") {
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 40.0), (5L, "a", 50.0),
      (6L, "b", 7.0), (7L, "b", 9.0)
    ).toDF("id", "g", "score")
    val got = Calibrate.percentileWithin(df, "score", Seq("g"))
      .select("id", "pct_rank").as[(Long, Double)].collect().toMap
    // group a (n=5): ranks over (n-1)=4 -> 0, .25, .25, .75, 1
    assert(got(1L) === 0.0)
    assert(got(2L) === 0.25 && got(3L) === 0.25) // tie shares the min rank
    assert(got(4L) === 0.75)
    assert(got(5L) === 1.0)
    // group b independent of a's values
    assert(got(6L) === 0.0 && got(7L) === 1.0)
  }

  test("robustZ: hand-computed median/MAD, outlier magnitude, degenerate MAD guarded") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0), (5L, "a", 100.0),
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0)
    ).toDF("id", "g", "x")
    val got = Calibrate.robustZ(df, "x", Seq("g"))
      .select("id", "med", "mad", "robust_z")
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    // group a: med=3, |x-3| = 2,1,0,1,97 -> mad=1
    assert(got(1L)._2 === 3.0 && got(1L)._3 === 1.0)
    val expect5 = BigDecimal((100.0 - 3.0) / 1.4826)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(5L)._4 === expect5)
    assert(math.abs(got(5L)._4) > 10) // the outlier is loud
    assert(math.abs(got(3L)._4) === 0.0)
    // group b: all identical -> mad 0 -> z forced to 0, flagged by mad
    assert(got(6L)._3 === 0.0 && got(6L)._4 === 0.0)
  }
}
