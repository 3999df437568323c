package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NormalDist

/** Heckman two-step sample-selection correction (Heckman 1979) — the
  * canonical fix for "we only observe y where someone chose to report
  * it": when selection correlates with the outcome's error, OLS on the
  * selected subsample is biased; the two-step estimator
  *
  *   1. fits a PROBIT of the selection indicator on the selection
  *      covariates over the FULL sample ([[Glm.probit]] — the latent-
  *      normal machinery is exactly what the correction's normality
  *      assumption requires),
  *   2. forms each selected row's inverse Mills ratio
  *      λ = ϕ(η̂)/Φ(η̂) and adds it as a regressor to the outcome OLS
  *      on the SELECTED subsample ([[Ols.fit]]),
  *
  * so λ's coefficient (= ρσ) absorbs the selection term
  * E[ε | selected] and the remaining coefficients are consistent.
  * A significant λ coefficient is itself the selection-bias readout.
  *
  * Scale shape: one probit (distributed IRLS, bounded driver state),
  * one row-local λ expression (ϕ and Φ are the shared portable normal
  * polynomial — no new numerics), one OLS (single Gram aggregate).
  * Exclusion restriction (some z not in x) is the user's modeling
  * responsibility; the code only requires the column lists.
  *
  * Returns one row per coefficient: (stage 'selection'|'outcome',
  * name, coef 6dp) — the outcome stage includes `lambda`.
  */
object Heckman {

  def twoStep(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      selCol: String,
      zCols: Seq[String]): DataFrame = {
    require(zCols.nonEmpty, "Heckman.twoStep: need selection covariates")
    require(xCols.nonEmpty, "Heckman.twoStep: need outcome covariates")
    val spark = df.sparkSession
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

    // machine-tight probit convergence (not the default 1e-9): the
    // Mills-ratio stage AMPLIFIES stage-1 coefficient error through the
    // near-collinear (1, λ) outcome design — a 1e-7 coefficient wobble
    // (what a 1e-9 relative-deviance stop leaves) becomes ~1e-6 in the
    // outcome intercept/λ, straddling the 6dp output quantizer between
    // engines (r11 sf0.1 lesson). At 1e-12 both engines sit within ulps
    // of the MLE and the replay is stable.
    val sel = Glm.probit(df, selCol, zCols, tol = 1e-12, maxIter = 60)
    // inverse Mills ratio at the fitted selection index, with the same
    // ±8 saturation clamp the family uses (Φ → 0 underflow guard)
    val etaHat = least(greatest(sel.etaCol, lit(-8.0)), lit(8.0))
    val pdf = lit(NormalDist.INV_SQRT_2PI) * exp(-(etaHat * etaHat) / lit(2.0))
    val cdf = greatest(NormalDist.phi(etaHat), lit(1e-12))
    val selected = df
      .where(col(selCol).cast("double") > 0.5)
      .withColumn("__imr", pdf / cdf)
    val out = Ols.fit(selected, yCol, xCols :+ "__imr")

    val rows =
      sel.xNames.zip(sel.coef).map { case (nm, b) => ("selection", nm, q6(b)) } ++
        out.xNames.zip(out.coef).map { case (nm, b) =>
          ("outcome", if (nm == "__imr") "lambda" else nm, q6(b))
        }
    rows.toSeq.toDF("stage", "name", "coef")
  }
}
