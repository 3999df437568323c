package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NormalDist

/** Type-I Tobit — censored-outcome regression (Tobin 1958), the third
  * member of the latent-normal econometrics trio beside [[Glm.probit]]
  * (binary) and [[Heckman.twoStep]] (selected): y = max(y*, L) with
  * y* = x'β + ε, ε ~ N(0, σ²). OLS on the censored outcome biases β
  * toward zero; the Tobit MLE integrates the censored mass through
  * Φ((L − x'β)/σ).
  *
  * Newton–Raphson in Olsen's (1978) reparameterization (δ, γ) =
  * (β/σ, 1/σ), under which the log-likelihood
  *   Σ_unc [ln γ + ln ϕ(γy − x'δ)] + Σ_cens ln Φ(γL − x'δ)
  * is GLOBALLY concave — Newton from any start converges to the MLE.
  * All gradient/Hessian terms are row-local closed forms in the shared
  * portable normal polynomial ([[graft.functions.NormalDist]]); each
  * iteration is ONE distributed aggregate of (k+1)(k+4)/2 + 1 moments
  * over a checkpointed (k+2)-column projection, and the (k+1)×(k+1)
  * Newton solve runs on the driver — the [[Glm]] IRLS scale shape
  * exactly. Init: OLS on the uncensored rows.
  */
object Tobit {

  case class Model(
      xNames: Seq[String],
      beta: Array[Double],
      sigma: Double,
      loglik: Double,
      iters: Int,
      converged: Boolean,
      n: Long,
      nCensored: Long)

  def fit(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      lower: Double = 0.0,
      maxIter: Int = 50,
      tol: Double = 1e-8): Model = {
    val k = xCols.size + 1 // intercept first
    val names = "(intercept)" +: xCols
    val base = df.select(
      (col(yCol).cast("double").as("__y") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__x$i") }): _*)
      .withColumn("__cens", (col("__y") <= lower).cast("int"))
      .localCheckpoint(true)
    val cntRow = base.agg(count(lit(1)), sum(col("__cens").cast("long"))).head()
    val n = cntRow.getLong(0); val nCens = cntRow.getLong(1)
    require(n > nCens, "Tobit.fit: every row is censored")
    require(nCens >= 0, "unreachable")

    def xc(j: Int): Column = if (j == 0) lit(1.0) else col(s"__x${j - 1}")

    // init from OLS on the uncensored subsample
    val unc = base.where(col("__cens") === 0)
    val ols = Ols.fit(unc.withColumnRenamed("__y", "__yo"), "__yo",
      (0 until k - 1).map(i => s"__x$i"))
    val resVar = {
      val fitted = ols.xNames.zip(ols.coef).map {
        case ("(intercept)", b) => lit(b)
        case (x, b)             => col(x) * b
      }.reduce(_ + _)
      val r = unc.agg(
        (sum(pow(col("__y") - fitted, 2)) / count(lit(1))).as("v")).head().getDouble(0)
      math.max(r, 1e-8)
    }
    var gamma = 1.0 / math.sqrt(resVar)
    var delta: Array[Double] = ols.coef.map(_ * gamma)

    val pairs = for { a <- 0 until k; b <- a until k } yield (a, b)
    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val xdelta = (0 until k).map(j => xc(j) * delta(j)).reduce(_ + _)
      val z = lit(gamma) * col("__y") - xdelta // uncensored standardized resid
      val cRaw = lit(gamma * lower) - xdelta // censored index
      val c = least(greatest(cRaw, lit(-8.0)), lit(8.0))
      val pdf = lit(NormalDist.INV_SQRT_2PI) * exp(-(c * c) / lit(2.0))
      val cdf = greatest(NormalDist.phi(c), lit(1e-300))
      val mr = pdf / cdf // inverse Mills at c
      val dm = -(c * mr + mr * mr) // dm/dc, always negative
      // censor-indicator ARITHMETIC blend, not CASE: big shared trees
      // (mr, dm) duplicated inside multiple CASE branches blow the
      // generated consume() past the JIT method limit and the whole
      // stage runs interpreted (~8s/pass at sf0.1 → ~1s). Both branch
      // values are finite for every row (clamped c), so cI·a + (1−cI)·b
      // is exact for cI ∈ {0,1}.
      val cI = col("__cens").cast("double")
      val uI = lit(1.0) - cI
      val llTerm = cI * log(cdf) +
        uI * (log(lit(gamma)) + lit(math.log(NormalDist.INV_SQRT_2PI)) -
          z * z / lit(2.0))
      val gDeltaW = cI * -mr + uI * z // × x_j
      val gGamma = cI * (mr * lower) + uI * (lit(1.0) / gamma - z * col("__y"))
      val hDDW = cI * dm + uI * lit(-1.0) // × x_j x_k
      val hDGW = cI * (-dm * lower) + uI * col("__y") // × x_j
      val hGG = cI * (dm * lower * lower) +
        uI * (lit(-1.0) / lit(gamma * gamma) - col("__y") * col("__y"))
      // project the six per-row terms ONCE, then aggregate simple
      // products: inlining the shared ϕ/Φ trees into every aggregate
      // column instead re-evaluates them ~10× per row (measured 2.5×
      // slower end-to-end on the sf0.1 bench)
      val work = base.select(
        (Seq(llTerm.as("__ll"), gDeltaW.as("__gd"), gGamma.as("__gg"),
          hDDW.as("__hdd"), hDGW.as("__hdg"), hGG.as("__hgg")) ++
          (0 until k - 1).map(i => col(s"__x$i"))): _*)
      val aggs: Seq[Column] =
        sum(col("__ll")).as("ll") +:
          ((0 until k).map(j => sum(col("__gd") * xc(j))) ++
            Seq(sum(col("__gg"))) ++
            pairs.map { case (a, b) => sum(col("__hdd") * xc(a) * xc(b)) } ++
            (0 until k).map(j => sum(col("__hdg") * xc(j))) ++
            Seq(sum(col("__hgg"))))
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
      // maximize: step = (-H)^{-1} g
      val negH = h.map(_.map(-_))
      val step = LinAlg.solve(negH, g)
      delta = delta.zip(step.take(k)).map { case (d, s) => d + s }
      gamma = math.max(gamma + step(k), 1e-10)
      converged = step.map(math.abs).max < tol && (llNow - ll).abs < 1e-10 * (1 + llNow.abs)
      ll = llNow
      iter += 1
    }
    Model(names, delta.map(_ / gamma), 1.0 / gamma, ll, iter, converged, n, nCens)
  }

  /** Per-covariate summary frame: coef (6dp) plus sigma/loglik/counts. */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    m.xNames.zip(m.beta).map { case (nm, b) => (nm, q6(b)) }
      .toDF("name", "coef")
      .withColumn("sigma", lit(q6(m.sigma)))
      .withColumn("n", lit(m.n))
      .withColumn("n_censored", lit(m.nCensored))
      .withColumn("iters", lit(m.iters))
      .withColumn("converged", lit(if (m.converged) 1 else 0))
  }
}
