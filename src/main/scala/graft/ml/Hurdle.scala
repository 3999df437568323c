package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cragg (1971) / Mullahy (1986) hurdle count model — the two-part
  * alternative to [[Zip]]'s mixture when ALL zeros come from one
  * decision ("participate at all?") and the positive counts from a
  * second ("how much?"): a logit for P(y > 0) and a ZERO-TRUNCATED
  * Poisson for y | y > 0. Unlike ZIP's EM (latent responsibilities —
  * honestly rows+spec), the hurdle factorizes: BOTH parts are plain
  * deterministic IRLS loops, so the whole model replays in SQL.
  *
  * Truncated-Poisson Newton (= IRLS): with η = x'β, λ = e^η (clamped
  * ±30), truncated mean m = λ/(1 − e^{−λ}), score y − m, weight
  * Var_trunc = m(1 + λ − m), working response z = η + (y − m)/w;
  * convergence on the relative log-likelihood change (ℓ omits ln y!,
  * fit-invariant). The λ → 0 limit (m → 1) is guarded by flooring
  * 1 − e^{−λ} at 1e-300 — both engines evaluate the identical guard.
  *
  * Scale shape: the logit part is [[Glm.logistic]] (one codegen'd
  * Gram aggregate per pass); the truncated part is the same shape over
  * the POSITIVE rows only (a checkpointed projection); all solves are
  * driver k×k.
  */
object Hurdle {

  case class Model(
      xNames: Seq[String], // intercept first, both parts
      gamma: Array[Double], // logit coefficients for P(y > 0)
      beta: Array[Double], // truncated-Poisson coefficients
      llTrunc: Double,
      logitIters: Int,
      truncIters: Int,
      converged: Boolean,
      n: Long,
      nPos: Long)

  def fit(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      maxIter: Int = 30,
      tol: Double = 1e-9): Model = {
    val names = "(intercept)" +: xCols
    val k = names.length
    val base = df.select(
      (col(yCol).cast("double").as("__y") +:
        xCols.map(c => col(c).cast("double").as(c))): _*)
      .localCheckpoint(true)
    val cnt = base.agg(count(lit(1)),
      sum(when(col("__y") > 0, 1L).otherwise(0L))).head()
    val n = cnt.getLong(0); val nPos = cnt.getLong(1)
    require(nPos > 0, "Hurdle.fit: no positive counts — the truncated part is empty")
    require(nPos < n, "Hurdle.fit: no zeros — use a plain (truncated) count model")

    // part 1: logit of the participation indicator
    val withInd = base.withColumn("__pos", (col("__y") > 0).cast("double"))
    val logit = Glm.logistic(withInd, "__pos", xCols, tol = tol, maxIter = maxIter)

    // part 2: zero-truncated Poisson on the positive rows
    val pos = base.where(col("__y") > 0).localCheckpoint(true)
    val ybar = pos.agg(avg(col("__y"))).head().getDouble(0)
    val xcols: Seq[Column] = lit(1.0) +: xCols.map(c => col(c).cast("double"))
    var beta: Array[Double] = null
    var ll = Double.MaxValue
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val eta: Column =
        if (beta == null) log((col("__y") + lit(ybar)) / 2.0)
        else xcols.zip(beta).map { case (x, b) => x * b }.reduce(_ + _)
      val lam = exp(least(greatest(eta, lit(-30.0)), lit(30.0)))
      val oneMinus = greatest(lit(1.0) - exp(-lam), lit(1e-300))
      val m = lam / oneMinus
      val w = m * (lit(1.0) + lam - m)
      val z = eta + (col("__y") - m) / w
      val aggs: Seq[Column] =
        (for (i <- 0 until k; j <- i until k) yield sum(w * xcols(i) * xcols(j))) ++
          (0 until k).map(i => sum(w * xcols(i) * z)) :+
          sum(col("__y") * eta - lam - log(oneMinus))
      val row = pos.agg(aggs.head, aggs.tail: _*).head()
      var p = 0
      val g = Array.ofDim[Double](k, k)
      for (i <- 0 until k; j <- i until k) {
        val v = row.getDouble(p); p += 1
        g(i)(j) = v; g(j)(i) = v
      }
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      val llNow = row.getDouble(p + k)
      // convergence compares successive iterates' own fits (the Glm rule)
      converged = beta != null && math.abs(llNow - ll) / (math.abs(llNow) + 0.1) < tol
      beta = LinAlg.solve(g, c)
      ll = llNow
      iter += 1
    }
    Model(names, logit.coef, beta, ll, logit.iters, iter,
      logit.converged && converged, n, nPos)
  }
}
