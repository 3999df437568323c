package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** One-way random-effects panel estimator (Swamy–Arora 1972 feasible
  * GLS) plus the Hausman (1978) FE-vs-RE specification test — the
  * panel-family complement of [[FixedEffects]]: where the within
  * estimator WIPES the group effect (consistent even when effects
  * correlate with x, but discards all between-group variation), RE
  * models it as a random intercept u_g ~ (0, σ²_u) and quasi-demeanes
  * by θ_g = 1 − sqrt(σ²_e / (T_g σ²_u + σ²_e)) — efficient when the
  * effects are exogenous, and the Hausman statistic tests exactly that
  * exogeneity by comparing the two slopes. (cf. reference
  * `hdfe.py:14-297`'s within estimator — RE is the standard companion
  * an econometrics user expects beside it.)
  *
  * Scale shape (the reason this is ONE operator, not a pipeline): for
  * one regressor every moment of the within, between, and
  * θ-transformed regressions is an algebraic function of the PER-GROUP
  * sufficient statistics (n_g, Σx, Σy, Σxx, Σxy, Σyy) — so the whole
  * estimator is ONE groupBy over the facts (map-side combined, the
  * only corpus-sized pass) followed by ONE aggregate over the G-sized
  * group frame. Nothing n-sized ever shuffles twice; no second scan;
  * no driver loop. Unbalanced panels are handled exactly (per-group
  * θ_g; the Swamy–Arora σ²_u uses the harmonic mean T̄_h = G/Σ(1/T_g),
  * a documented convention of this engine).
  */
object RandomEffects {

  /** @param bRe      RE slope (quasi-demeaned GLS)
    * @param icept    RE intercept
    * @param bFe      within (FE) slope — the Hausman comparator
    * @param sigmaU   between-effect SD (√ of the variance component, ≥ 0)
    * @param sigmaE   idiosyncratic SD
    * @param thetaMin smallest per-group quasi-demeaning weight
    * @param thetaMax largest per-group quasi-demeaning weight
    * @param hausman  (b_FE − b_RE)² / (Var_FE − Var_RE); NaN when the
    *                 variance difference is non-positive (finite-sample
    *                 artifact — reported, not hidden)
    * @param pValue   χ²(1) upper tail of `hausman` via 2(1−Φ(√H))
    */
  final case class Model(
      bRe: Double,
      icept: Double,
      bFe: Double,
      sigmaU: Double,
      sigmaE: Double,
      thetaMin: Double,
      thetaMax: Double,
      hausman: Double,
      pValue: Double,
      n: Long,
      groups: Long)

  def fit(df: DataFrame, yCol: String, xCol: String, groupCol: String): Model = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    // the ONLY corpus-sized pass: per-group sufficient statistics
    val g = df
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("double").as("tn"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
      .localCheckpoint(true) // read twice: component pass + θ pass

    // ---- pass 1 over the G-sized frame: within + between moments ----
    val r1: Row = g.agg(
      sum(col("tn")).as("n"),
      count(lit(1)).cast("double").as("gcnt"),
      // within (group-centered) moments: Σxx − Σ_g sx²/n_g, etc.
      sum(col("sxx") - col("sx") * col("sx") / col("tn")).as("wxx"),
      sum(col("sxy") - col("sx") * col("sy") / col("tn")).as("wxy"),
      sum(col("syy") - col("sy") * col("sy") / col("tn")).as("wyy"),
      // between regression (group means, G observations)
      sum(col("sx") / col("tn")).as("bsx"),
      sum(col("sy") / col("tn")).as("bsy"),
      sum((col("sx") / col("tn")) * (col("sx") / col("tn"))).as("bsxx"),
      sum((col("sx") / col("tn")) * (col("sy") / col("tn"))).as("bsxy"),
      sum((col("sy") / col("tn")) * (col("sy") / col("tn"))).as("bsyy"),
      sum(lit(1.0) / col("tn")).as("sinvt")
    ).head()
    val n = r1.getAs[Double]("n"); val gc = r1.getAs[Double]("gcnt")
    val wxx = r1.getAs[Double]("wxx"); val wxy = r1.getAs[Double]("wxy")
    val wyy = r1.getAs[Double]("wyy")
    require(gc >= 3, "RandomEffects.fit: need at least 3 groups")
    require(wxx > 0, "RandomEffects.fit: x has no within-group variation")
    val bFe = wxy / wxx
    val ssrW = wyy - bFe * wxy
    val dofW = n - gc - 1.0
    require(dofW > 0, "RandomEffects.fit: no within degrees of freedom")
    val sigE2 = ssrW / dofW
    // between regression on the G group means (with intercept)
    val bvxx = r1.getAs[Double]("bsxx") - r1.getAs[Double]("bsx") * r1.getAs[Double]("bsx") / gc
    val bvxy = r1.getAs[Double]("bsxy") - r1.getAs[Double]("bsx") * r1.getAs[Double]("bsy") / gc
    val bvyy = r1.getAs[Double]("bsyy") - r1.getAs[Double]("bsy") * r1.getAs[Double]("bsy") / gc
    require(bvxx > 0, "RandomEffects.fit: group-mean x is constant (between regression singular)")
    val bB = bvxy / bvxx
    val ssrB = bvyy - bB * bvxy
    val sig2B = ssrB / (gc - 2.0) // G obs, intercept + slope
    // Swamy–Arora with the harmonic mean panel length (engine convention)
    val tHar = gc / r1.getAs[Double]("sinvt")
    val sigU2 = math.max(0.0, sig2B - sigE2 / tHar)

    // ---- pass 2: θ-transformed normal equations, still G-sized ------
    // every transformed moment is per-group algebra in (stats, θ_g):
    //   Σ* y x  = Σ_g [sxy − (2θ−θ²)·sx·sy/n]       (same for xx, yy)
    //   Σ* 1 x  = Σ_g (1−θ)²·sx                      (intercept col = 1−θ)
    //   Σ* 1 1  = Σ_g n·(1−θ)²
    val theta = lit(1.0) - sqrt(lit(sigE2) / (col("tn") * lit(sigU2) + lit(sigE2)))
    val r2: Row = g
      .withColumn("th", theta)
      .agg(
        sum(col("sxx") - (lit(2.0) * col("th") - col("th") * col("th")) *
          col("sx") * col("sx") / col("tn")).as("txx"),
        sum(col("sxy") - (lit(2.0) * col("th") - col("th") * col("th")) *
          col("sx") * col("sy") / col("tn")).as("txy"),
        sum(col("syy") - (lit(2.0) * col("th") - col("th") * col("th")) *
          col("sy") * col("sy") / col("tn")).as("tyy"),
        sum((lit(1.0) - col("th")) * (lit(1.0) - col("th")) * col("sx")).as("tix"),
        sum((lit(1.0) - col("th")) * (lit(1.0) - col("th")) * col("sy")).as("tiy"),
        sum(col("tn") * (lit(1.0) - col("th")) * (lit(1.0) - col("th"))).as("tii"),
        min(col("th")).as("thmin"),
        max(col("th")).as("thmax")
      ).head()
    val txx = r2.getAs[Double]("txx"); val txy = r2.getAs[Double]("txy")
    val tyy = r2.getAs[Double]("tyy")
    val tix = r2.getAs[Double]("tix"); val tiy = r2.getAs[Double]("tiy")
    val tii = r2.getAs[Double]("tii")
    // 2×2 normal equations [[tii, tix], [tix, txx]] [a, b] = [tiy, txy]
    val det = tii * txx - tix * tix
    require(det > 0, "RandomEffects.fit: transformed design is singular")
    val bRe = (tii * txy - tix * tiy) / det
    val aRe = (tiy - bRe * tix) / tii
    val varFe = sigE2 / wxx
    // FGLS theory variance σ²_e·(X*'X*)⁻¹ with the WITHIN σ²_e — the
    // Hausman construction requires it: RE uses strictly more
    // information than FE, so Var_FE ≥ Var_RE holds by construction
    // under this variance; plugging the transformed-regression residual
    // variance instead INFLATES Var_RE exactly when the RE model is
    // misspecified and the test would NaN out on the case it exists for
    val varRe = sigE2 * tii / det // slope diagonal of σ²_e(X*'X*)⁻¹
    val dVar = varFe - varRe
    val h = if (dVar > 0) (bFe - bRe) * (bFe - bRe) / dVar else Double.NaN
    val p =
      if (h.isNaN) Double.NaN
      else {
        // χ²(1) tail = 2(1 − Φ(√H)) via the shared portable polynomial
        val z = math.sqrt(h)
        val t = 1.0 / (1.0 + graft.functions.NormalDist.P * z)
        val pdf = graft.functions.NormalDist.INV_SQRT_2PI * math.exp(-(z * z) / 2.0)
        import graft.functions.NormalDist._
        val poly = t * (B1 + t * (B2 + t * (B3 + t * (B4 + t * B5))))
        2.0 * (pdf * poly)
      }
    g.unpersist(false)
    Model(bRe, aRe, bFe, math.sqrt(sigU2), math.sqrt(sigE2),
      r2.getAs[Double]("thmin"), r2.getAs[Double]("thmax"), h, p,
      math.round(n), math.round(gc))
  }

  /** One-row summary frame (driver scalars, 6dp floor-quantized). */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(m.bRe), q6(m.icept), q6(m.bFe), q6(m.sigmaU), q6(m.sigmaE),
      q6(m.thetaMin), q6(m.thetaMax),
      if (m.hausman.isNaN) None else Some(q6(m.hausman)),
      if (m.pValue.isNaN) None else Some(q6(m.pValue)),
      m.n, m.groups))
      .toDF("b_re", "icept_re", "b_fe", "sigma_u", "sigma_e",
        "theta_min", "theta_max", "hausman", "p_hausman", "n", "groups")
  }
}
