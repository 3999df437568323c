package graft.ml

import graft.SparkSpec

class HurdleSpec extends SparkSpec {
  import spark.implicits._

  test("Hurdle.fit: dense truncated-Poisson IRLS replica at 1e-9; planted structure recovered") {
    // participation driven by x1 (deterministic threshold-ish), intensity
    // by x2 — the factorization the hurdle model exists for
    val rows = (0 until 800).map { i =>
      val x1 = math.sin(i * 0.7) * 2
      val x2 = math.cos(i * 1.3)
      val lam = math.exp(1.0 + 0.5 * x2)
      // deterministic "Poisson-ish" positive count from a quantile grid
      val u = (i % 97) / 97.0
      val pois = (lam + (u - 0.5) * 2 * math.sqrt(lam)).max(1.0).round.toDouble
      val y = if (x1 + (i % 13) / 13.0 - 0.5 > 0.3) pois else 0.0
      (x1, x2, y)
    }
    val df = rows.toDF("x1", "x2", "y")
    val m = Hurdle.fit(df, "y", Seq("x1", "x2"))
    assert(m.converged, s"iters=${m.truncIters}/${m.logitIters}")
    assert(m.gamma(1) > 1.0, s"participation must load on x1: ${m.gamma.toSeq}")
    // the grid-based pseudo-Poisson is only mean-faithful to ~0.2 after
    // the floor-at-1 — the exact contract is the dense replica below
    assert(math.abs(m.beta(2) - 0.5) < 0.25, s"intensity slope: ${m.beta.toSeq}")
    assert(m.nPos > 0 && m.nPos < m.n)

    // dense replica of the truncated part
    val pos = rows.filter(_._3 > 0)
    val ybar = pos.map(_._3).sum / pos.length
    var beta = Array(0.0, 0.0, 0.0)
    var ll = Double.MaxValue
    var it = 0; var done = false
    var first = true
    while (it < 30 && !done) {
      val g = Array.ofDim[Double](3, 3)
      val c = new Array[Double](3)
      var llNow = 0.0
      pos.foreach { case (x1, x2, y) =>
        val xs = Array(1.0, x1, x2)
        val eta = if (first) math.log((y + ybar) / 2.0)
                  else xs.zip(beta).map { case (a, b) => a * b }.sum
        val lam = math.exp(math.min(math.max(eta, -30.0), 30.0))
        val om = math.max(1.0 - math.exp(-lam), 1e-300)
        val mm = lam / om
        val w = mm * (1.0 + lam - mm)
        val z = eta + (y - mm) / w
        for (i <- 0 to 2; j <- 0 to 2) g(i)(j) += w * xs(i) * xs(j)
        for (i <- 0 to 2) c(i) += w * xs(i) * z
        llNow += y * eta - lam - math.log(om)
      }
      done = !first && math.abs(llNow - ll) / (math.abs(llNow) + 0.1) < 1e-9
      beta = LinAlg.solve(g, c)
      ll = llNow
      first = false
      it += 1
    }
    assert(m.truncIters === it, s"${m.truncIters} vs $it")
    (0 to 2).foreach(i => assert(math.abs(m.beta(i) - beta(i)) < 1e-9,
      s"${m.beta.toSeq} vs ${beta.toSeq}"))
    assert(math.abs(m.llTrunc - ll) < 1e-6 * math.abs(ll))
  }

  test("Hurdle.fit: guards — all-zero and no-zero inputs raise") {
    val zeros = (0 until 20).map(i => (i.toDouble, 0.0, 0.0)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException](Hurdle.fit(zeros, "y", Seq("x1", "x2")))
    val nozero = (0 until 20).map(i => (i.toDouble, 1.0, (i % 3 + 1).toDouble))
      .toDF("x1", "x2", "y")
    intercept[IllegalArgumentException](Hurdle.fit(nozero, "y", Seq("x1", "x2")))
  }
}
