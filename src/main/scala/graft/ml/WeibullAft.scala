package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weibull accelerated-failure-time regression — the PARAMETRIC member
  * of the survival family beside the nonparametric Kaplan–Meier
  * ([[Survival]]) and the semiparametric Cox PH ([[Cox]]):
  * ln T = x'β + σ·ε with ε standard minimum-Gumbel, i.e. T Weibull
  * with scale e^{x'β} and shape 1/σ. Coefficients read as log time
  * ratios (e^{β} multiplies survival time — often the more
  * interpretable scale than Cox's hazard ratios), and the fit
  * extrapolates beyond the last observed event where KM cannot.
  *
  * Newton–Raphson on (β, τ = ln σ) with right censoring:
  * z = (ln t − x'β)/σ, ll = Σ d(−τ + z) − e^z (censored rows keep only
  * −e^z). Gradient/Hessian are row-local closed forms; each iteration
  * is ONE distributed moment aggregate over a checkpointed projection
  * + a (k+1)-dim driver solve — the [[Tobit]] scale shape exactly.
  * Init: OLS of ln t on x over the uncensored rows, τ = ln(residual
  * sd).
  */
object WeibullAft {

  case class Model(
      xNames: Seq[String],
      beta: Array[Double],
      sigma: Double,
      shape: Double, // Weibull k = 1/sigma
      loglik: Double,
      iters: Int,
      converged: Boolean,
      n: Long,
      nEvents: Long)

  def fit(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      xCols: Seq[String],
      maxIter: Int = 50,
      tol: Double = 1e-8): Model = {
    val k = xCols.size + 1 // intercept first
    val names = "(intercept)" +: xCols
    val base = df
      .where(col(durationCol).cast("double") > 0)
      .select(
        (log(col(durationCol).cast("double")).as("__lt") +:
          col(eventCol).cast("int").as("__d") +:
          xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__x$i") }): _*)
      .localCheckpoint(true)
    val cnt = base.agg(count(lit(1)), sum(col("__d").cast("long"))).head()
    val n = cnt.getLong(0); val nEvents = cnt.getLong(1)
    require(nEvents > 0, "WeibullAft.fit: no events (all rows censored)")

    def xc(j: Int): Column = if (j == 0) lit(1.0) else col(s"__x${j - 1}")

    // init: OLS of ln t on x over events; tau from the residual sd
    val ev = base.where(col("__d") === 1)
    val ols = Ols.fit(ev, "__lt", (0 until k - 1).map(i => s"__x$i"))
    val fitted = ols.xNames.zip(ols.coef).map {
      case ("(intercept)", b) => lit(b)
      case (x, b)             => col(x) * b
    }.reduce(_ + _)
    val rv = ev.agg((sum(pow(col("__lt") - fitted, 2)) / count(lit(1)))).head().getDouble(0)
    var beta: Array[Double] = ols.coef.clone()
    var tau = 0.5 * math.log(math.max(rv, 1e-6))

    val pairs = for { a <- 0 until k; b <- a until k } yield (a, b)
    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    // backtracking state: the likelihood is concave in β at fixed σ but
    // NOT jointly in (β, τ), so a raw Newton step can go uphill in the
    // wrong basin — each pass evaluates ll at the current point, and a
    // DECREASE rejects the previous step by halving back toward the
    // last accepted point before trying again
    var accTheta: Array[Double] = beta :+ tau
    var lastStep: Array[Double] = Array.fill(k + 1)(0.0)
    while (iter < maxIter && !converged) {
      val sigma = math.exp(tau)
      val xb = (0 until k).map(j => xc(j) * beta(j)).reduce(_ + _)
      val z = least(greatest((col("__lt") - xb) / lit(sigma), lit(-30.0)), lit(30.0))
      val ez = exp(z)
      val d = col("__d").cast("double")
      val llTerm = d * (lit(-tau) + z) - ez
      val gB = (ez - d) / lit(sigma) // × x_j
      val gT = -d - z * (d - ez)
      val hBB = -ez / lit(sigma * sigma) // × x_j x_k
      val hBT = -(z * ez + ez - d) / lit(sigma) // × x_j
      val hTT = z * (d - ez) - z * z * ez
      // project per-row terms once, aggregate simple products (the
      // Tobit lesson: inlining shared exp trees into every aggregate
      // column re-evaluates them per column)
      val work = base.select(
        (Seq(llTerm.as("__ll"), gB.as("__gb"), gT.as("__gt"),
          hBB.as("__hbb"), hBT.as("__hbt"), hTT.as("__htt")) ++
          (0 until k - 1).map(i => col(s"__x$i"))): _*)
      val aggs: Seq[Column] =
        sum(col("__ll")).as("ll") +:
          ((0 until k).map(j => sum(col("__gb") * xc(j))) ++
            Seq(sum(col("__gt"))) ++
            pairs.map { case (a, b) => sum(col("__hbb") * xc(a) * xc(b)) } ++
            (0 until k).map(j => sum(col("__hbt") * xc(j))) ++
            Seq(sum(col("__htt"))))
      val r = work.agg(aggs.head, aggs.tail: _*).head()
      val llNow = r.getDouble(0)
      val g = Array.tabulate(k + 1)(i => r.getDouble(1 + i))
      val h = Array.ofDim[Double](k + 1, k + 1)
      pairs.zipWithIndex.foreach { case ((a, b), i) =>
        val v = r.getDouble(2 + k + i); h(a)(b) = v; h(b)(a) = v
      }
      (0 until k).foreach { j =>
        val v = r.getDouble(2 + k + pairs.size + j); h(j)(k) = v; h(k)(j) = v
      }
      h(k)(k) = r.getDouble(2 + k + pairs.size + k)
      if (llNow < ll && lastStep.exists(_ != 0.0)) {
        // the last step went downhill: halve back toward the accepted
        // point and re-evaluate (no Newton update this pass)
        lastStep = lastStep.map(_ / 2.0)
        val cand = accTheta.zip(lastStep).map { case (a, s) => a + s }
        beta = cand.take(k); tau = cand(k)
      } else {
        // accept, then take a (sup-norm-capped) Newton step
        ll = llNow
        accTheta = beta :+ tau
        val step = LinAlg.solve(h.map(_.map(-_)), g)
        val scale = math.min(1.0, 2.0 / math.max(1e-12, step.map(math.abs).max))
        lastStep = step.map(_ * scale)
        beta = beta.zip(lastStep.take(k)).map { case (b, s) => b + s }
        tau = tau + lastStep(k)
        converged = lastStep.map(math.abs).max < tol
      }
      iter += 1
    }
    val sig = math.exp(tau)
    Model(names, beta, sig, 1.0 / sig, ll, iter, converged, n, nEvents)
  }

  /** Summary frame: per-coefficient rows plus scale/shape (6dp). */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    m.xNames.zip(m.beta).map { case (nm, b) => (nm, q6(b), q6(math.exp(b))) }
      .toDF("name", "coef", "time_ratio")
      .withColumn("sigma", lit(q6(m.sigma)))
      .withColumn("shape", lit(q6(m.shape)))
      .withColumn("n", lit(m.n))
      .withColumn("n_events", lit(m.nEvents))
      .withColumn("iters", lit(m.iters))
      .withColumn("converged", lit(if (m.converged) 1 else 0))
  }
}
