package graft.ml

import graft.SparkSpec

class RobustSpec extends SparkSpec {
  import spark.implicits._

  /** Dense IRLS replica: same init (OLS), same MAD/0.6745 scale, same
    * Huber weights, same normal equations.
    */
  private def denseHuber(
      xs: Seq[Array[Double]], ys: Seq[Double], k: Double,
      maxIter: Int = 30, tol: Double = 1e-9): Array[Double] = {
    val n = ys.size
    val p = xs.head.length + 1
    def design(i: Int) = 1.0 +: xs(i)

    def wls(w: Seq[Double]): Array[Double] = {
      val g = Array.ofDim[Double](p, p); val c = Array.fill(p)(0.0)
      for (i <- 0 until n) {
        val d = design(i)
        for (a <- 0 until p) {
          c(a) += w(i) * d(a) * ys(i)
          for (b <- 0 until p) g(a)(b) += w(i) * d(a) * d(b)
        }
      }
      LinAlg.solve(g, c)
    }
    var beta = wls(Seq.fill(n)(1.0))
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val resid = (0 until n).map(i => ys(i) - design(i).zip(beta).map(t => t._1 * t._2).sum)
      val sorted = resid.map(math.abs).sorted
      // Spark's percentile(0.5): linear interpolation between order stats
      val mad = {
        val pos = (n - 1) * 0.5
        val lo = sorted(pos.toInt); val hi = sorted(math.ceil(pos).toInt)
        lo + (hi - lo) * (pos - pos.toInt)
      }
      val sigma = math.max(mad / 0.6745, 1e-12)
      val w = resid.map(r => math.min(1.0, k * sigma / math.max(math.abs(r), 1e-300)))
      val next = wls(w)
      done = next.zip(beta).map(t => math.abs(t._1 - t._2)).max < tol
      beta = next
      iter += 1
    }
    beta
  }

  test("Robust.huber matches the dense IRLS replica at 1e-7") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 400).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextDouble()
      val y = 2.0 + 1.5 * x1 - 3.0 * x2 + rng.nextGaussian() * 0.4
      (y, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val m = Robust.huber(df, "y", Seq("x1", "x2"))
    val ref = denseHuber(rows.map(r => Array(r._2, r._3)), rows.map(_._1), 1.345)
    m.coef.zip(ref).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-7, s"${m.coef.toSeq} vs ${ref.toSeq}")
    }
  }

  test("Robust.huber resists outliers that wreck plain OLS") {
    val rng = new scala.util.Random(9)
    val clean = (1 to 500).map { _ =>
      val x = rng.nextGaussian()
      (1.0 + 2.0 * x + rng.nextGaussian() * 0.2, x)
    }
    // 5% gross outliers: y shifted by +80 at high x
    val dirty = clean ++ (1 to 25).map { _ =>
      val x = 2.0 + rng.nextDouble()
      (1.0 + 2.0 * x + 80.0, x)
    }
    val df = dirty.toDF("y", "x")
    val ols = Ols.fit(df, "y", Seq("x"))
    val hub = Robust.huber(df, "y", Seq("x"))
    assert(math.abs(ols.coef(1) - 2.0) > 0.5, s"outliers should bias OLS, got ${ols.coef(1)}")
    assert(math.abs(hub.coef(1) - 2.0) < 0.2, s"Huber should resist, got ${hub.coef(1)}")
  }

  test("Robust.huber GK-sketch MAD: coefficients within 1e-3 of the exact path") {
    val rng = new scala.util.Random(11)
    // planted-outlier corpus: y = 1 + 2x with 5% gross outliers
    val dirty = (1 to 4000).map { i =>
      val x = rng.nextGaussian()
      val y = if (i % 20 == 0) 50.0 + rng.nextGaussian() else 1.0 + 2.0 * x + rng.nextGaussian() * 0.3
      (y, x)
    }
    val df = dirty.toDF("y", "x")
    val exact = Robust.huber(df, "y", Seq("x"))
    val approx = Robust.huber(df, "y", Seq("x"), approxMad = true)
    for ((a, b) <- exact.coef.zip(approx.coef))
      assert(math.abs(a - b) < 1e-3, s"sketch drift: exact=$a approx=$b")
    assert(math.abs(approx.coef(1) - 2.0) < 0.2)
  }

  test("Decompose.oaxaca: identical structures make the gap fully explained") {
    val rng = new scala.util.Random(4)
    // both groups share y = 1 + 2x; only the x composition differs →
    // unexplained ≈ 0, explained ≈ gap
    val a = (1 to 2000).map { _ => val x = 3.0 + rng.nextGaussian(); ("A", x, 1.0 + 2.0 * x + rng.nextGaussian() * 0.1) }
    val b = (1 to 2000).map { _ => val x = 1.0 + rng.nextGaussian(); ("B", x, 1.0 + 2.0 * x + rng.nextGaussian() * 0.1) }
    val r = Decompose.oaxaca((a ++ b).toDF("g", "x", "y"), "g", "A", "B", "y", "x").head()
    val gap = r.getAs[Double]("gap")
    assert(math.abs(gap - 4.0) < 0.2) // 2·(3−1)
    assert(math.abs(r.getAs[Double]("unexplained")) < 0.15)
    assert(math.abs(r.getAs[Double]("explained") + r.getAs[Double]("unexplained") - gap) < 2e-6)
  }

  test("Decompose.oaxaca: identical composition makes the gap fully unexplained") {
    val rng = new scala.util.Random(6)
    val a = (1 to 2000).map { _ => val x = rng.nextGaussian(); ("A", x, 5.0 + 2.0 * x + rng.nextGaussian() * 0.1) }
    val b = (1 to 2000).map { _ => val x = rng.nextGaussian(); ("B", x, 1.0 + 2.0 * x + rng.nextGaussian() * 0.1) }
    val r = Decompose.oaxaca((a ++ b).toDF("g", "x", "y"), "g", "A", "B", "y", "x").head()
    assert(math.abs(r.getAs[Double]("gap") - 4.0) < 0.2)
    assert(math.abs(r.getAs[Double]("explained")) < 0.15)
  }

  test("deming: exact line gives slope 1; x-noise attenuates OLS but not Deming") {
    import spark.implicits._
    val exact = (0 to 20).map(i => (i.toDouble, i.toDouble)).toDF("x", "y")
    val e = Robust.deming(exact, "x", "y").head()
    assert(e.getAs[Double]("slope") === 1.0 && e.getAs[Double]("icept") === 0.0)

    // true t, x measured with symmetric noise, y = t (+ matching noise):
    // OLS(y~x) attenuates toward 0; Deming (λ=1) stays near 1
    val rows = (1 to 2000).map { i =>
      val t = i / 100.0
      val ex = if (i % 2 == 0) 1.0 else -1.0
      val ey = if (i % 4 < 2) 1.0 else -1.0
      (t + ex, t + ey)
    }
    val d = Robust.deming(rows.toDF("x", "y"), "x", "y").head()
    val ols = d.getAs[Double]("slope_ols")
    val dem = d.getAs[Double]("slope")
    assert(ols < 0.98, s"OLS must attenuate: $ols")
    assert(math.abs(dem - 1.0) < 0.02, s"Deming must not: $dem")
    assert(dem > ols)
    // degenerate: zero x-variance -> null fit
    val flat = (1 to 10).map(i => (1.0, i.toDouble)).toDF("x", "y")
    val f = Robust.deming(flat, "x", "y").head()
    assert(f.isNullAt(f.fieldIndex("slope")))
  }
}
