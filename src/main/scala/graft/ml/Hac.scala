package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Newey–West HAC (heteroskedasticity-and-autocorrelation-consistent)
  * standard errors for OLS on a time-indexed frame (Newey & West 1987)
  * — the time-series companion of [[Ols]]'s cluster-robust sandwich
  * (SURVEY §2 C113): serially correlated errors make the plain OLS SEs
  * lie, and a trend regression on any aggregated event series IS
  * serially correlated. Bread (X'X)⁻¹; meat S = Γ̂₀ + Σ_{l≤L}
  * w_l(Γ̂_l + Γ̂_lᵀ) with Bartlett weights w_l = 1 − l/(L+1), Γ̂_l =
  * Σ_t u_t u_{t−l} x_t x_{t−l}ᵀ on the OLS residuals u.
  *
  * Scale shape: one [[Ols.fit]] Gram pass; Γ̂₀ is one more aggregate of
  * row-local expressions; each Γ̂_l is ONE equi-join of the (t, u, x)
  * frame on key = t−l (the [[UnitRoot.kpss]] Bartlett convention —
  * gaps contribute no pair, shuffles only on the time key) reduced to
  * k² sums. L is an explicit small budget, never derived from n; all
  * k×k algebra is driver-side [[LinAlg]].
  */
object Hac {

  final case class NwModel(
      names: Seq[String],
      coef: Array[Double],
      seNw: Array[Double],
      seOls: Array[Double],
      lags: Int,
      n: Long)

  def neweyWest(
      df: DataFrame,
      tCol: String,
      yCol: String,
      xCols: Seq[String],
      lags: Int = 4): NwModel = {
    require(lags >= 0, "Hac.neweyWest: lags must be >= 0")
    val base = df.select(
      (col(tCol).cast("long").as("__t") +:
        col(yCol).cast("double").as("__y") +:
        xCols.map(c => col(c).cast("double").as(c))): _*)
      .localCheckpoint(true) // read by the fit pass + one join per lag
    val model = Ols.fit(base, "__y", xCols)
    val k = model.coef.length
    require(model.n > k + lags, "Hac.neweyWest: not enough observations")
    val xcols: Seq[Column] = lit(1.0) +: xCols.map(c => col(c).cast("double"))
    val uCol = col("__y") - Ols.fittedCol(model)
    // (t, u, x…) — the lag joins re-read this narrow frame
    val scored = base.select(
      (col("__t") +: uCol.as("__u") +: xCols.map(c => col(c))): _*)

    def gammaOf(rows: DataFrame, ua: Column, ub: Column,
        xa: Int => Column, xb: Int => Column): Array[Array[Double]] = {
      // coalesce: a lag join past the series end has zero pairs
      val aggs = for (i <- 0 until k; j <- 0 until k)
        yield coalesce(sum(ua * ub * xa(i) * xb(j)), lit(0.0))
      val row = rows.agg(aggs.head, aggs.tail: _*).head()
      Array.tabulate(k, k)((i, j) => row.getDouble(i * k + j))
    }

    // Γ0: Σ u² x xᵀ — symmetric, one pass
    val xAt: Int => Column = i => if (i == 0) lit(1.0) else col(xCols(i - 1))
    val s = gammaOf(scored, col("__u"), col("__u"), xAt, xAt)
    for (l <- 1 to lags) {
      val lagged = scored.select(
        ((col("__t") + l).as("__t") +: col("__u").as("__ul") +:
          xCols.map(c => col(c).as(s"__l_$c"))): _*)
      val joined = scored.join(lagged, Seq("__t"))
      val xbAt: Int => Column = i => if (i == 0) lit(1.0) else col(s"__l_${xCols(i - 1)}")
      val gl = gammaOf(joined, col("__u"), col("__ul"), xAt, xbAt)
      val w = 1.0 - l.toDouble / (lags + 1.0)
      for (i <- 0 until k; j <- 0 until k)
        s(i)(j) += w * (gl(i)(j) + gl(j)(i))
    }
    val bread = LinAlg.inverse(model.gram)
    val v = LinAlg.matMul(LinAlg.matMul(bread, s), bread)
    NwModel(
      model.xNames, model.coef,
      Array.tabulate(k)(i => math.sqrt(v(i)(i))),
      model.seHomoskedastic,
      lags, model.n)
  }

  final case class CoModel(
      rho: Double,
      b0: Double,
      b1: Double,
      seB1: Double,
      nPairs: Long,
      iters: Int,
      converged: Boolean)

  /** Cochrane–Orcutt iterative FGLS for AR(1) errors (Cochrane &
    * Orcutt 1949) — where [[neweyWest]] only FIXES the SEs, CO fixes
    * the ESTIMATE: iterate ρ̂ = Σu_t u_{t−1}/Σu²_{t−1} on the current
    * residuals, quasi-difference (y*, x*) = (y_t − ρy_{t−1},
    * x_t − ρx_{t−1}), re-fit, until ρ settles. The first observation
    * is dropped (classic CO, not Prais–Winsten); the level intercept
    * is recovered as α* / (1 − ρ).
    *
    * Scale shape: the lag-pair frame is built ONCE (one t−1 equi-join
    * — gaps contribute no pair, the [[UnitRoot]] convention — then
    * localCheckpoint'ed); each iteration is two aggregates over it
    * (the ρ moment and the 2-param transformed Gram). Nothing
    * corpus-sized moves per iteration.
    */
  def cochraneOrcutt(
      df: DataFrame,
      tCol: String,
      yCol: String,
      xCol: String,
      tol: Double = 1e-8,
      maxIter: Int = 50): CoModel = {
    val base = df.select(
      col(tCol).cast("long").as("t"),
      col(yCol).cast("double").as("y"),
      col(xCol).cast("double").as("x"))
      .localCheckpoint(true)
    val lagged = base.select((col("t") + 1L).as("t"),
      col("y").as("ylag"), col("x").as("xlag"))
    val pairs = base.join(lagged, Seq("t")).localCheckpoint(true)
    val init = Ols.fit(base, "y", Seq("x"))
    var b0 = init.coef(0); var b1 = init.coef(1)
    var rho = 0.0
    var model: OlsModel = null
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val u = col("y") - (lit(b0) + lit(b1) * col("x"))
      val ul = col("ylag") - (lit(b0) + lit(b1) * col("xlag"))
      val rRow = pairs.agg(sum(u * ul), sum(ul * ul)).head()
      require(rRow.getDouble(1) > 0, "Hac.cochraneOrcutt: lagged residuals degenerate")
      val rhoNew = rRow.getDouble(0) / rRow.getDouble(1)
      require(math.abs(rhoNew) < 1.0,
        s"Hac.cochraneOrcutt: |rho| >= 1 ($rhoNew) — difference the series instead")
      val transformed = pairs
        .withColumn("__ys", col("y") - lit(rhoNew) * col("ylag"))
        .withColumn("__xs", col("x") - lit(rhoNew) * col("xlag"))
      model = Ols.fit(transformed, "__ys", Seq("__xs"))
      b1 = model.coef(1)
      b0 = model.coef(0) / (1.0 - rhoNew)
      done = math.abs(rhoNew - rho) < tol
      rho = rhoNew
      iter += 1
    }
    CoModel(rho, b0, b1, model.seHomoskedastic(1), model.n, iter, done)
  }

  final case class BgResult(
      lm: Double,
      lags: Int,
      r2Aux: Double,
      nAux: Long,
      pValue: Double,
      reject5pct: Boolean)

  /** Breusch–Godfrey serial-correlation LM test (Breusch 1978, Godfrey
    * 1978) — the FORMAL higher-order complement of the Durbin–Watson
    * statistic (DW only reads AR(1) against tabulated bounds; BG tests
    * AR/MA(p) with an exact χ²(p) p-value, and stays valid with lagged
    * regressors): regress the OLS residuals on (1, X, û_{t−1}…û_{t−p});
    * LM = n·R² of that auxiliary regression ~ χ²(p) under the
    * no-serial-correlation null, p-value via
    * [[graft.functions.NormalDist.chiSqUpperTail]].
    *
    * Convention: rows missing ANY of the p residual lags are dropped
    * (the classic first-p-observations rule; on a gapped time index the
    * gap edges drop too — the [[UnitRoot]] family's no-pair rule).
    * Scale shape: one [[Ols.fit]] Gram pass, p equi-joins on t−l to
    * assemble the lag frame, one auxiliary Gram pass; solves driver-side.
    */
  def breuschGodfrey(
      df: DataFrame,
      tCol: String,
      yCol: String,
      xCols: Seq[String],
      lags: Int = 1): BgResult = {
    require(lags >= 1, "Hac.breuschGodfrey: lags must be >= 1")
    val base = df.select(
      (col(tCol).cast("long").as("__t") +:
        col(yCol).cast("double").as("__y") +:
        xCols.map(c => col(c).cast("double").as(c))): _*)
      .localCheckpoint(true)
    val model = Ols.fit(base, "__y", xCols)
    val scored = base.select(
      (col("__t") +: (col("__y") - Ols.fittedCol(model)).as("__u") +:
        xCols.map(c => col(c))): _*)
    val joined = (1 to lags).foldLeft(scored) { (acc, l) =>
      acc.join(
        scored.select((col("__t") + l).as("__t"), col("__u").as(s"__ul$l")),
        Seq("__t"))
    }
    val aux = Ols.fit(joined, "__u", xCols ++ (1 to lags).map(l => s"__ul$l"))
    // centered R² of the auxiliary regression
    val mRow = joined.agg(count(lit(1)).cast("double"), sum(col("__u"))).head()
    val nAux = mRow.getDouble(0)
    require(nAux > xCols.length + lags + 1, "Hac.breuschGodfrey: not enough aligned rows")
    val ubar = mRow.getDouble(1) / nAux
    val sst = joined.agg(
      sum((col("__u") - lit(ubar)) * (col("__u") - lit(ubar)))).head().getDouble(0)
    require(sst > 0, "Hac.breuschGodfrey: residuals have no variation")
    val r2 = 1.0 - aux.ssr / sst
    val lm = nAux * r2
    val p = graft.functions.NormalDist.chiSqUpperTail(lm, lags)
    BgResult(lm, lags, r2, math.round(nAux), p, p < 0.05)
  }

  /** One-row BG summary — lm/r2 at 4dp (an sf0.1 probe found the 6dp
    * grid landing on a rounding boundary by data luck; the diagnostics
    * don't need 6 digits), p at 6dp. */
  def bgSummary(spark: org.apache.spark.sql.SparkSession, r: BgResult): DataFrame = {
    import spark.implicits._
    def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q4(r.lm), r.lags, q4(r.r2Aux), r.nAux, q6(r.pValue),
      if (r.reject5pct) 1 else 0))
      .toDF("lm", "lags", "r2_aux", "n_aux", "p_value", "reject_5pct")
  }

  /** One-row CO summary (6dp floor-quantized). */
  def coSummary(spark: org.apache.spark.sql.SparkSession, m: CoModel): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(m.rho), q6(m.b0), q6(m.b1), q6(m.seB1), m.nPairs, m.iters,
      if (m.converged) 1 else 0))
      .toDF("rho", "b0", "b1", "se_b1", "n_pairs", "iters", "converged")
  }

  /** One row per parameter (6dp floor-quantized): name, coef, se_nw,
    * se_ols (the naive comparator — the gap is the serial-correlation
    * correction), t_nw, plus lags and n repeated.
    */
  def summary(spark: org.apache.spark.sql.SparkSession, m: NwModel): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    m.names.indices.map { i =>
      (m.names(i), q6(m.coef(i)), q6(m.seNw(i)), q6(m.seOls(i)),
        q6(m.coef(i) / m.seNw(i)), m.lags, m.n)
    }.toDF("name", "coef", "se_nw", "se_ols", "t_nw", "lags", "n")
  }
}
