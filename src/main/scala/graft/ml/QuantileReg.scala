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
  * optimality gap max_j |Σ x_j(τ − 1{r<0})| / √(τ(1−τ)Σx_j²) — a z-score against the subgradient's own sampling noise at the optimum (an exact LP optimum scores ≤ max|x|/√(τ(1−τ)Σx²) ≈ 0; an unconverged fit scores O(√n)) — an a-posteriori
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
      delta: Double = Double.NaN,
      tol: Double = 1e-7,
      gapTol: Double = 0.1,
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
    var beta: Array[Double] = null
    // certificate denominators √(τ(1−τ)·Σx_j²): one standard error of
    // the subgradient sum AT the optimum (each row contributes x_j·sgn
    // with sgn ∈ {τ, τ−1}, variance τ(1−τ)x_j² under the optimal split)
    // — iteration-constant, rides the init Gram's diagonal
    val gradSe = new Array[Double](k)
    locally {
      val aggs = (for (i <- 0 until k; j <- i until k) yield sum(xcols(i) * xcols(j))) ++
        (0 until k).map(i => sum(xcols(i) * yc))
      val row = projected.agg(aggs.head, aggs.tail: _*).head()
      var p = 0
      val g = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- i until k) { val v = row.getDouble(p); p += 1; g(i)(j) = v; g(j)(i) = v }
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      for (i <- 0 until k) gradSe(i) = math.sqrt(tau * (1.0 - tau) * g(i)(i))
      beta = LinAlg.solve(g, c)
    }

    // auto-δ: the smoothing floor must live on the RESIDUAL scale — a
    // δ orders of magnitude below mean|r| lets near-zero residuals
    // dominate every weighted Gram (w = τside/δ) and freezes the line
    // on its current zero crossings, creeping for 100 iterations on
    // skewed data; 1e-3·mean|r_OLS| keeps the smoothing bias O(δ)
    // (far below coefficient tolerances) while the weights stay tame
    val deltaEff =
      if (!delta.isNaN) delta
      else {
        val xb0 = xcols.zip(beta).map { case (x, b) => x * b }.reduce(_ + _)
        val madr = projected.agg(avg(abs(yc - xb0))).head().getDouble(0)
        math.max(1e-12, 1e-3 * madr)
      }

    // the δ-smoothed IRLS can 2-cycle within O(δ) of the optimum
    // (residuals crossing zero flip their weights each pass), and on
    // flat valleys the loss can creep below tol-per-step for many
    // passes while the CERTIFICATE is already tight — so the
    // subgradient sums Σ x_j(τ − 1{r<0}) ride the SAME per-iteration
    // aggregate (free: the sign is a function of this pass's r) and the
    // loop stops at certified near-optimality, on smooth loss
    // convergence, or on cycle detection, whichever first. The returned
    // iterate is the best-loss one WITH ITS OWN certificate.
    var loss = Double.MaxValue
    var bestLoss = Double.MaxValue
    var bestBeta = beta
    var bestGap = Double.MaxValue
    var noImprove = 0
    var n = 0L
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val xb = xcols.zip(beta).map { case (x, b) => x * b }.reduce(_ + _)
      val r = yc - xb
      val tauSide = when(r < 0.0, lit(1.0 - tau)).otherwise(lit(tau))
      val sgn = when(r < 0.0, lit(tau - 1.0)).otherwise(lit(tau))
      val w = tauSide / greatest(abs(r), lit(deltaEff))
      val aggs: Seq[Column] =
        (for (i <- 0 until k; j <- i until k) yield sum(w * xcols(i) * xcols(j))) ++
          (0 until k).map(i => sum(w * xcols(i) * yc)) ++
          (0 until k).map(i => sum(xcols(i) * sgn)) ++
          Seq(sum(tauSide * abs(r)).as("loss"), count(lit(1)).as("n"))
      val row = projected.agg(aggs.head, aggs.tail: _*).head()
      var p = 0
      val g = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- i until k) { val v = row.getDouble(p); p += 1; g(i)(j) = v; g(j)(i) = v }
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      val gapNow = (0 until k).map { i =>
        math.abs(row.getDouble(p + k + i)) / math.max(gradSe(i), 1e-12)
      }.max
      val lossNow = row.getDouble(p + 2 * k)
      n = row.getLong(p + 2 * k + 1)
      val smooth = math.abs(lossNow - loss) / (math.abs(lossNow) + 1e-12) < tol
      if (lossNow < bestLoss - tol * (math.abs(bestLoss) + 1e-12)) noImprove = 0
      else noImprove += 1
      if (lossNow < bestLoss) { bestLoss = lossNow; bestBeta = beta; bestGap = gapNow }
      converged = gapNow < gapTol || (loss != Double.MaxValue && smooth) || noImprove >= 3
      loss = lossNow
      beta = LinAlg.solve(g, c)
      iter += 1
    }
    projected.unpersist(false)
    QrModel(tau, names, bestBeta, n, iter, converged, bestLoss, bestGap)
  }
}
