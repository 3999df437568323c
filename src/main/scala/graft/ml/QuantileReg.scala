package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed quantile regression (Koenker–Bassett 1978): minimize the
  * pinball loss Σ ρ_τ(y − x'β), ρ_τ(r) = r(τ − 1{r<0}) — the
  * conditional-τ-quantile line, robust where OLS chases the conditional
  * mean. The classic solver is an LP (interior point / simplex), which
  * does not distribute; graft uses iteratively-reweighted least squares
  * on the δ-smoothed loss (Schlossmacher 1973 / Hunter–Lange MM view):
  * each step solves the weighted normal equations with
  * w = |τ − 1{r<0}| / max(|r|, δ), which majorizes the pinball loss, so
  * every iteration is ONE codegen'd weighted-Gram aggregate over the
  * same persisted projection the GLM loop uses — identical scale shape
  * to [[Glm.fit]] (k(k+1)/2+k sums per pass, driver k×k solve).
  *
  * Convergence is declared on the relative change of the PINBALL LOSS
  * (not the coefficients), and the model carries the subgradient-
  * optimality gap max_j |Σ x_j(τ − 1{r<0})| / Σ|x_j| — an a-posteriori
  * certificate INDEPENDENT of the iteration path (at the true optimum
  * the pinball subgradient contains 0), so a caller can tell a
  * converged fit from a stalled one.
  */
case class QrModel(
    tau: Double,
    xNames: Seq[String],
    coef: Array[Double],
    n: Long,
    iters: Int,
    converged: Boolean,
    pinballLoss: Double,
    gradGap: Double
)

object QuantileReg {

  def fit(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      tau: Double,
      intercept: Boolean = true,
      delta: Double = 1e-4,
      tol: Double = 1e-7,
      maxIter: Int = 100
  ): QrModel = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    val names = (if (intercept) Seq("(intercept)") else Nil) ++ xs
    val projected = df.select(
      (xs.map(c => col(c).cast("double").as(s"__x_$c")) :+
        col(y).cast("double").as("__y")): _*).persist()
    val xcols: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xs.map(c => col(s"__x_$c"))
    val yc = col("__y")
    val k = xcols.length

    // start from the OLS fit (the τ-independent center)
    var beta = {
      val aggs = (for (i <- 0 until k; j <- i until k) yield sum(xcols(i) * xcols(j))) ++
        (0 until k).map(i => sum(xcols(i) * yc))
      val row = projected.agg(aggs.head, aggs.tail: _*).head()
      var p = 0
      val g = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- i until k) { val v = row.getDouble(p); p += 1; g(i)(j) = v; g(j)(i) = v }
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      LinAlg.solve(g, c)
    }

    // the δ-smoothed IRLS can 2-cycle within O(δ) of the optimum
    // (residuals crossing zero flip their weights each pass); track the
    // best pinball iterate and return THAT — the gradGap certificate
    // below measures the returned β, not the final iterate
    var loss = Double.MaxValue
    var bestLoss = Double.MaxValue
    var bestBeta = beta
    var n = 0L
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val xb = xcols.zip(beta).map { case (x, b) => x * b }.reduce(_ + _)
      val r = yc - xb
      val tauSide = when(r < 0.0, lit(1.0 - tau)).otherwise(lit(tau))
      val w = tauSide / greatest(abs(r), lit(delta))
      val aggs: Seq[Column] =
        (for (i <- 0 until k; j <- i until k) yield sum(w * xcols(i) * xcols(j))) ++
          (0 until k).map(i => sum(w * xcols(i) * yc)) ++
          Seq(sum(tauSide * abs(r)).as("loss"), count(lit(1)).as("n"))
      val row = projected.agg(aggs.head, aggs.tail: _*).head()
      var p = 0
      val g = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- i until k) { val v = row.getDouble(p); p += 1; g(i)(j) = v; g(j)(i) = v }
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      val lossNow = row.getDouble(p + k)
      n = row.getLong(p + k + 1)
      converged = math.abs(lossNow - loss) / (math.abs(lossNow) + 1e-12) < tol
      loss = lossNow
      if (lossNow < bestLoss) { bestLoss = lossNow; bestBeta = beta }
      beta = LinAlg.solve(g, c)
      iter += 1
    }
    beta = bestBeta
    loss = bestLoss

    // a-posteriori optimality certificate at the returned β
    val xbF = xcols.zip(beta).map { case (x, b) => x * b }.reduce(_ + _)
    val sgn = when(yc - xbF < 0.0, lit(tau - 1.0)).otherwise(lit(tau))
    val gradAggs = (0 until k).flatMap(i =>
      Seq(sum(xcols(i) * sgn).as(s"g_$i"), sum(abs(xcols(i))).as(s"a_$i")))
    val gr = projected.agg(gradAggs.head, gradAggs.tail: _*).head()
    val gap = (0 until k).map { i =>
      math.abs(gr.getDouble(2 * i)) / math.max(gr.getDouble(2 * i + 1), 1e-12)
    }.max
    projected.unpersist(false)
    QrModel(tau, names, beta, n, iter, converged, loss, gap)
  }
}
