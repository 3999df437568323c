package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  test("Changepoint.cusum equals the textbook max(0, ...) recursion") {
    val vals = Seq(10.0, 11, 9, 10, 10, 11, 9, 10, 15, 16, 15, 17, 16, 15)
    val df = vals.zipWithIndex.map { case (v, t) => ("k", t, v) }.toDF("k", "t", "v")
    val got = Changepoint.cusum(df, "k", "t", "v", kSigma = 0.5, hSigma = 3.0)
      .orderBy("t").collect()
    // driver replay of the recursion with the same explicit-moment mu/sigma
    val n = vals.size
    val mu = vals.sum / n
    val sigma = math.sqrt(vals.map(v => v * v).sum / n - mu * mu)
    var (cp, cn) = (0.0, 0.0)
    val want = vals.map { v =>
      cp = math.max(0.0, cp + v - mu - 0.5 * sigma)
      cn = math.max(0.0, cn + mu - v - 0.5 * sigma)
      (cp, cn)
    }
    for ((r, (wp, wn)) <- got.zip(want)) {
      assert(math.abs(r.getAs[Double]("cusum_pos") - wp) < 1e-6, s"pos at t=${r.getAs[Int]("t")}")
      assert(math.abs(r.getAs[Double]("cusum_neg") - wn) < 1e-6, s"neg at t=${r.getAs[Int]("t")}")
    }
    // the planted level shift at t=8 alarms; the stable prefix does not
    assert(got.take(8).forall(_.getAs[Long]("alarm") == 0L))
    assert(got.drop(9).exists(_.getAs[Long]("alarm") == 1L))
  }

  test("Changepoint.cusum: constant series has sigma 0 and never alarms") {
    val df = (0 until 20).map(t => ("k", t, 7.0)).toDF("k", "t", "v")
    val got = Changepoint.cusum(df, "k", "t", "v").collect()
    assert(got.forall(_.getAs[Double]("sigma") == 0.0))
    assert(got.forall(_.getAs[Long]("alarm") == 0L))
  }

  test("Seasonal.decompose recovers a planted trend + weekly pattern") {
    val season = Array(4.0, -2, -1, 0, 1, -3, 1) // sums to 0
    val rows = (0 until 70).map { t => ("k", t, 100.0 + 0.5 * t + season(t % 7)) }
    val df = rows.toDF("k", "t", "v")
    val got = Seasonal.decompose(df, "k", "t", "v", period = 7).orderBy("t").collect()
    // edges: first/last 3 rows have null trend/resid
    assert(got.take(3).forall(_.isNullAt(got.head.fieldIndex("trend"))))
    assert(got.takeRight(3).forall(_.isNullAt(got.head.fieldIndex("trend"))))
    // interior: centered MA of a linear+zero-sum-seasonal series IS the trend line
    got.drop(3).dropRight(3).foreach { r =>
      val t = r.getAs[Int]("t")
      assert(math.abs(r.getAs[Double]("trend") - (100.0 + 0.5 * t)) < 1e-6, s"trend t=$t")
    }
    // seasonal component recovered per position; residuals ~ 0
    got.drop(3).dropRight(3).foreach { r =>
      val t = r.getAs[Int]("t")
      assert(math.abs(r.getAs[Double]("seasonal") - season(t % 7)) < 1e-6, s"seasonal t=$t")
      assert(math.abs(r.getAs[Double]("resid")) < 1e-6, s"resid t=$t")
    }
  }

  test("Forecast.holtWinters tracks a planted trend+season and forecasts it") {
    val season = Array(5.0, -2, -1, -2)
    val rows = (0 until 96).map(t => ("k", t.toLong, 50.0 + 2.0 * t + season(t % 4)))
    val got = Forecast.holtWinters(rows.toDF("k", "t", "v"), "k", "t", "v",
      period = 4, alpha = 0.5, beta = 0.3, gamma = 0.4, horizon = 8)
      .orderBy("t").collect()
    assert(got.length == 96 + 8)
    val obs = got.filter(!_.getAs[Boolean]("is_forecast"))
    // late in-sample one-step fits land within the noise-free tolerance
    obs.drop(48).foreach { r =>
      val t = r.getAs[Long]("t")
      val fitted = r.getAs[Double]("fitted")
      val truth = 50.0 + 2.0 * t + season((t % 4).toInt)
      assert(math.abs(fitted - truth) < 0.8, s"t=$t fitted=$fitted truth=$truth")
    }
    // forecasts extrapolate trend + season within tolerance
    got.filter(_.getAs[Boolean]("is_forecast")).foreach { r =>
      val t = r.getAs[Long]("t")
      val truth = 50.0 + 2.0 * t + season((t % 4).toInt)
      assert(math.abs(r.getAs[Double]("fitted") - truth) < 1.5, s"forecast t=$t")
      assert(r.isNullAt(r.fieldIndex("v")))
    }
  }

  test("Forecast.holtWinters: short series flagged with null outputs, never failed") {
    val rows = (0 until 5).map(t => ("k", t.toLong, 1.0 * t))
    val got = Forecast.holtWinters(rows.toDF("k", "t", "v"), "k", "t", "v", period = 4)
      .collect()
    assert(got.length == 5)
    assert(got.forall(r => r.isNullAt(r.fieldIndex("level"))))
  }

  test("Seasonal.decompose validates the period and shards by key") {
    intercept[IllegalArgumentException] {
      Seasonal.decompose(Seq(("k", 1, 1.0)).toDF("k", "t", "v"), "k", "t", "v", period = 4)
    }
    // two keys with different levels decompose independently
    val df = (0 until 35).flatMap(t => Seq(("a", t, 10.0), ("b", t, 50.0)))
      .toDF("k", "t", "v")
    val got = Seasonal.decompose(df, "k", "t", "v", period = 7)
      .where(col("trend").isNotNull)
    val trends = got.groupBy("k").agg(min("trend"), max("trend")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(trends("a") == ((10.0, 10.0)) && trends("b") == ((50.0, 50.0)))
  }

  test("Changepoint.pageHinkley equals the driver fold; shift alarms, stable key doesn't") {
    // key 1: stable around 10 then a jump to 30; key 2: flat
    val v1 = Seq(10.0, 11, 9, 10, 11, 9, 10, 30, 31, 30, 29, 31, 30, 30)
    val v2 = Seq(5.0, 5, 5, 5, 5, 5)
    val rows = v1.zipWithIndex.map { case (v, t) => (1L, t, t.toLong, v) } ++
      v2.zipWithIndex.map { case (v, t) => (2L, t, (100 + t).toLong, v) }
    val df = rows.toDF("k", "t", "tie", "v")
    val got = Changepoint.pageHinkley(df, "k", "t", "tie", "v", delta = 0.1, lambda = 15.0)
      .orderBy("k", "t").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Int]("t")) ->
        ((r.getAs[Double]("ph_up"), r.getAs[Double]("ph_dn"), r.getAs[Long]("alarm"))))
      .toMap

    // driver fold replicating the exact arithmetic
    def fold(vs: Seq[Double]): Seq[(Double, Double, Long)] = {
      var n = 0L; var sx = 0.0; var mu = 0.0; var md = 0.0
      var minU = Double.MaxValue; var minD = Double.MaxValue
      vs.map { v =>
        n += 1; sx += v
        val dev = v - sx / n
        mu += dev - 0.1; md += -dev - 0.1
        minU = math.min(minU, mu); minD = math.min(minD, md)
        val pu = math.floor((mu - minU) * 1e6 + 0.5) / 1e6
        val pd = math.floor((md - minD) * 1e6 + 0.5) / 1e6
        (pu, pd, if (pu > 15.0 || pd > 15.0) 1L else 0L)
      }
    }
    fold(v1).zipWithIndex.foreach { case (exp, t) => assert(got((1L, t)) === exp, s"k1 t=$t") }
    fold(v2).zipWithIndex.foreach { case (exp, t) => assert(got((2L, t)) === exp, s"k2 t=$t") }
    // the up-shift alarms on key 1 and never on the stable key 2
    assert(got.exists { case ((k, _), (_, _, a)) => k == 1L && a == 1L })
    assert(!got.exists { case ((k, _), (_, _, a)) => k == 2L && a == 1L })
  }

  test("Forecast.ar1: exact AR(1) recovered; forecasts unroll; short/flat keys null") {
    import spark.implicits._
    // y_t = 5 + 0.5*y_{t-1} exactly -> phi = .5, icept = 5, fixed point 10
    var y = 0.0
    val exact = (1 to 40).map { t => y = 5.0 + 0.5 * y; ("ar", t, y) }
    val shortK = Seq(("short", 1, 1.0), ("short", 2, 2.0))
    val flat = (1 to 10).map(t => ("flat", t, 7.0))
    val df = (exact ++ shortK ++ flat).toDF("k", "t", "v")
    val got = graft.ops.Forecast.ar1(df, "k", "t", "t", "v")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val ar = got("ar")
    assert(math.abs(ar.getAs[Double]("phi") - 0.5) < 1e-6)
    assert(math.abs(ar.getAs[Double]("icept") - 5.0) < 1e-5)
    val yl = ar.getAs[Double]("y_last")
    assert(math.abs(ar.getAs[Double]("f1") - (5.0 + 0.5 * yl)) < 1e-5)
    assert(math.abs(ar.getAs[Double]("f3") - 10.0) < 1e-3) // pulls to the fixed point
    assert(got("short").isNullAt(got("short").fieldIndex("phi"))) // < 3 pairs
    assert(got("flat").isNullAt(got("flat").fieldIndex("phi"))) // zero lag variance
    assert(got("flat").getAs[Double]("y_last") === 7.0)
  }

  test("Forecast.accuracy: hand scorecard; naive prediction gives MASE exactly 1") {
    import spark.implicits._
    // key a: y = 1..5, pred = y - 1 (constant error 1)
    val a = (1 to 5).map(i => ("a", i, i.toDouble, Some(i - 1.0)))
    // key naive: pred = lag(y) exactly -> MASE = 1 by construction
    val yv = Seq(3.0, 7.0, 2.0, 9.0, 5.0)
    val nv = yv.zipWithIndex.map { case (v, i) =>
      ("nv", i + 1, v, if (i == 0) None else Some(yv(i - 1)))
    }
    val got = graft.ops.Forecast
      .accuracy((a ++ nv).toDF("k", "t", "y", "p"), "k", "t", "t", "y", "p")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val ra = got("a")
    assert(ra.getAs[Long]("n_scored") === 5L && ra.getAs[Long]("n_unscored") === 0L)
    assert(ra.getAs[Double]("mae") === 1.0 && ra.getAs[Double]("rmse") === 1.0)
    // mape = mean(1/1..1/5)? no: |e|/y = 1/y -> (1+1/2+1/3+1/4+1/5)/5 = 137/300
    assert(math.abs(ra.getAs[Double]("mape") - 137.0 / 300.0) < 1e-6)
    val rn = got("nv")
    assert(rn.getAs[Long]("n_unscored") === 1L) // the first row has no pred
    assert(rn.getAs[Double]("mase") === 1.0)
  }
}
