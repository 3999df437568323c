package graft.ml

import graft.SparkSpec

class CoxSpec extends SparkSpec {
  import spark.implicits._

  /** Dense single-machine Newton on the Breslow partial likelihood —
    * the independent reference the distributed fit must reproduce.
    */
  private def denseFit(
      rows: Seq[(Double, Int, Array[Double])],
      maxIter: Int = 25,
      tol: Double = 1e-9): (Array[Double], Double) = {
    val k = rows.head._3.length
    var beta = Array.fill(k)(0.0)
    var ll = Double.NegativeInfinity
    var iter = 0
    var stop = false
    while (iter < maxIter && !stop) {
      val w = rows.map { case (_, _, x) =>
        math.exp(x.zip(beta).map { case (a, b) => a * b }.sum)
      }
      var llNew = 0.0
      val g = Array.fill(k)(0.0)
      val h = Array.ofDim[Double](k, k)
      for (i <- rows.indices if rows(i)._2 == 1) {
        val ti = rows(i)._1
        // Breslow risk set: everyone with t >= ti (ties pooled)
        val rs = rows.indices.filter(j => rows(j)._1 >= ti)
        val s0 = rs.map(w).sum
        val s1 = Array.tabulate(k)(p => rs.map(j => rows(j)._3(p) * w(j)).sum)
        val eta = rows(i)._3.zip(beta).map { case (a, b) => a * b }.sum
        llNew += eta - math.log(s0)
        for (p <- 0 until k) {
          g(p) += rows(i)._3(p) - s1(p) / s0
          for (q <- 0 until k) {
            val s2 = rs.map(j => rows(j)._3(p) * rows(j)._3(q) * w(j)).sum
            h(p)(q) += s2 / s0 - (s1(p) / s0) * (s1(q) / s0)
          }
        }
      }
      val d = LinAlg.solve(h, g)
      beta = beta.zip(d).map { case (b, x) => b + x }
      stop = d.map(math.abs).max < tol
      ll = llNew
      iter += 1
    }
    (beta, ll)
  }

  private def mkDf(rows: Seq[(Double, Int, Array[Double])]) =
    rows.map { case (t, e, x) => (t, e, x(0), x(1)) }.toDF("t", "ev", "x0", "x1")

  test("Cox.fit matches the dense Breslow Newton at 1e-9 (ties included)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 120).map { _ =>
      val x0 = rng.nextGaussian(); val x1 = rng.nextDouble()
      // exponential survival with hazard exp(0.8*x0 - 1.2*x1); round
      // durations to 1dp to force tied event times through Breslow
      val u = rng.nextDouble()
      val t0 = -math.log(u) / math.exp(0.8 * x0 - 1.2 * x1)
      val t = math.max(0.1, math.rint(t0 * 10) / 10)
      val cens = rng.nextDouble() < 0.25
      (t, if (cens) 0 else 1, Array(x0, x1))
    }
    val (bRef, llRef) = denseFit(rows)
    val m = Cox.fit(mkDf(rows), "t", "ev", Seq("x0", "x1"))
    assert(math.abs(m.beta(0) - bRef(0)) < 1e-9)
    assert(math.abs(m.beta(1) - bRef(1)) < 1e-9)
    assert(math.abs(m.loglik - llRef) < 1e-7 * (1 + llRef.abs))
    assert(m.nEvents > 0 && m.nEvents < m.n)
  }

  test("Cox.fit recovers a planted hazard-ratio direction and magnitude") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 800).map { _ =>
      val x0 = if (rng.nextBoolean()) 1.0 else 0.0
      val x1 = rng.nextGaussian()
      val t = -math.log(rng.nextDouble()) / math.exp(1.0 * x0)
      (t, 1, Array(x0, x1))
    }
    val m = Cox.fit(mkDf(rows), "t", "ev", Seq("x0", "x1"))
    // true log-HR 1.0 for x0, 0 for x1
    assert(m.beta(0) > 0.75 && m.beta(0) < 1.25, s"beta0=${m.beta(0)}")
    assert(math.abs(m.beta(1)) < 0.15, s"beta1=${m.beta(1)}")
    assert(m.hazardRatios(0) === math.exp(m.beta(0)))
  }

  test("Cox.fit censored-only input raises; all-events runs") {
    val allCens = Seq((1.0, 0, Array(0.5, 0.1)), (2.0, 0, Array(0.2, 0.3)))
    intercept[IllegalArgumentException] {
      Cox.fit(mkDf(allCens), "t", "ev", Seq("x0", "x1"))
    }
  }
}
