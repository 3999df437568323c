package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Huber robust regression (Huber 1964) via IRLS — the outlier-resistant
  * OLS beside the L1 check-loss quantile regression ([[QuantileReg]]):
  * squared loss inside the k·σ band, linear outside, so gross outliers
  * contribute bounded influence instead of owning the fit.
  *
  * Each IRLS step is engine-native: one residual-scale pass (exact
  * median absolute deviation via `percentile` — two aggregate jobs) and
  * one [[Ols.fitWeighted]] Gram pass with the Huber weight
  * w = min(1, kσ/|r|) as a row-local column — nothing corpus-sized on
  * the driver, per-iteration cost identical to one weighted OLS.
  */
object Robust {

  case class HuberModel(
      names: Seq[String],
      coef: Array[Double],
      sigma: Double,
      iters: Int,
      n: Long)

  /** Fit with tuning constant `k` (1.345 = 95% Gaussian efficiency).
    * Scale σ is re-estimated each iteration as MAD/0.6745 of the
    * current residuals (the standard proposal-2 pairing).
    *
    * `approxMad = true` switches each iteration's median-of-|resid| to
    * the Greenwald–Khanna sketch (`percentile_approx`, rank error ≤
    * n/`approxAccuracy`) — the >10⁸-row path: the exact `percentile`
    * aggregate buffers every residual through the final reducer, the GK
    * sketch ships one bounded summary per partition. σ only gates the
    * Huber weights, so a rank-ε MAD perturbs coefficients at O(ε)
    * (RobustSpec pins ≤ 1e-3 drift on a planted-outlier corpus).
    * Default stays exact — oracle parity.
    */
  def huber(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      k: Double = 1.345,
      maxIter: Int = 30,
      tol: Double = 1e-9,
      approxMad: Boolean = false,
      approxAccuracy: Int = 10000): HuberModel = {
    val base = df.select((col(y).cast("double").as("__y") +:
      xs.map(c => col(c).cast("double").as(c))): _*).localCheckpoint(true)
    var model = Ols.fit(base, "__y", xs)
    var sigma = 0.0
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val resid = col("__y") - Ols.fittedCol(model)
      val madAgg =
        if (approxMad)
          expr(s"percentile_approx(abs(${residSql(model, xs)}), 0.5, $approxAccuracy)")
        else expr(s"percentile(abs(${residSql(model, xs)}), 0.5)")
      val mad = base.agg(madAgg).head().getDouble(0)
      sigma = math.max(mad / 0.6745, 1e-12)
      val wcol = least(lit(1.0), lit(k * sigma) / greatest(abs(resid), lit(1e-300)))
      val next = Ols.fitWeighted(base.withColumn("__w", wcol), "__y", xs, "__w")
      val delta = next.coef.zip(model.coef).map { case (a, b) => math.abs(a - b) }.max
      model = next
      done = delta < tol
      iter += 1
    }
    HuberModel(model.xNames, model.coef, sigma, iter, model.n)
  }

  // percentile() needs a SQL expression string for the residual: build
  // y − (b0 + Σ b_i x_i) with the coefficient doubles inlined
  private def residSql(m: OlsModel, xs: Seq[String]): String = {
    val terms = m.xNames.zip(m.coef).map {
      case ("(intercept)", b) => s"($b)"
      case (x, b)             => s"($b) * $x"
    }
    s"__y - (${terms.mkString(" + ")})"
  }

  /** Coefficient frame for a fitted model (floor-quantized 6dp). */
  def summary(spark: org.apache.spark.sql.SparkSession, m: HuberModel): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    m.names.zip(m.coef).map { case (nm, b) => (nm, q6(b)) }
      .toDF("name", "coef")
      .withColumn("sigma", lit(q6(m.sigma)))
      .withColumn("iters", lit(m.iters))
      .withColumn("n", lit(m.n))
  }

  /** Deming regression — errors-in-BOTH-variables line fit with known
    * error-variance ratio λ = σ²_y/σ²_x (λ = 1 ⇒ orthogonal
    * regression): the method-comparison standard where OLS attenuates
    * (it charges all noise to y). Closed form on centered moments:
    * slope = (Cyy − λCxx + √((Cyy − λCxx)² + 4λC²xy)) / (2Cxy),
    * intercept = ȳ − slope·x̄. ONE 5-moment aggregate; Cxy = 0 (no
    * linear association — the form degenerates) or zero variances →
    * null fit. Returns one row: n, slope, icept (6dp), plus the OLS
    * slope for the attenuation comparison.
    */
  def deming(
      df: DataFrame,
      xCol: String,
      yCol: String,
      lambda: Double = 1.0): DataFrame = {
    require(lambda > 0, "deming: lambda must be positive")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val m = df.agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
    val n = col("n").cast("double")
    val cxx = col("sxx") - col("sx") * col("sx") / n
    val cxy = col("sxy") - col("sx") * col("sy") / n
    val cyy = col("syy") - col("sy") * col("sy") / n
    val d = cyy - lit(lambda) * cxx
    val slope = (d + sqrt(d * d + lit(4.0 * lambda) * cxy * cxy)) / (lit(2.0) * cxy)
    val icept = col("sy") / n - slope * (col("sx") / n)
    val ok = col("n") > 2 && cxx > 0 && cyy > 0 && abs(cxy) > 0
    m.select(
      col("n").cast("long").as("n"),
      when(ok, q6(slope)).as("slope"),
      when(ok, q6(icept)).as("icept"),
      when(col("n") > 2 && cxx > 0, q6(cxy / cxx)).as("slope_ols"))
  }
}
