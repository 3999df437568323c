package graft.ml

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("Conformal.splitIntervals: hand order-statistic half-width on a tiny calibration set") {
    // train rows (even ids) put y = 10x exactly → fit is exact;
    // odd-id calibration rows have residuals 1..9 by construction
    val train = (0 until 20 by 2).map(i => (i.toLong, 10.0 * i, i.toDouble))
    val cal = (1 to 9).map(i => ((2 * i + 101).toLong, 10.0 * i + i, i.toDouble))
    // ids 103..119 odd; resid = i for x = i
    val df = (train ++ cal).toDF("id", "y", "x")
    val out = Conformal.splitIntervals(df, "id", "y", Seq("x"),
      covNum = 9, covDen = 10, emitEvery = 1, emitResidue = 0)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("pred"), r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    // n_cal = 9 → rank = min(ceil(9*10/10), 9) = 9 → q = largest resid = 9
    val (p, lo, hi) = out(0L)
    assert(p === 0.0 && lo === -9.0 && hi === 9.0)
    val (p2, lo2, hi2) = out(10L)
    assert(p2 === 100.0 && lo2 === 91.0 && hi2 === 109.0)
  }

  test("Conformal.splitIntervals: empirical coverage ≈ 90% on exchangeable noise") {
    val rng = new scala.util.Random(21)
    val rows = (0L until 4000L).map { i =>
      val x = rng.nextGaussian()
      (i, 3.0 + 2.0 * x + rng.nextGaussian(), x)
    }
    val df = rows.toDF("id", "y", "x")
    val iv = Conformal.splitIntervals(df, "id", "y", Seq("x"), emitEvery = 1)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("lo"), r.getAs[Double]("hi")))).toMap
    val y = rows.map(r => r._1 -> r._2).toMap
    val covered = rows.count { case (i, yy, _) =>
      val (lo, hi) = iv(i); yy >= lo && yy <= hi
    }
    val rate = covered.toDouble / rows.size
    assert(rate > 0.87 && rate < 0.94, s"coverage $rate should be ≈ 0.90")
  }
}
