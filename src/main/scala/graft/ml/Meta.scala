package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverse-variance meta-analysis — combine per-study (effect, se)
  * rows into fixed-effect and DerSimonian–Laird random-effects
  * summaries, the standard readout for "one estimate per segment /
  * per experiment, what is the pooled effect and how heterogeneous is
  * it". Complements [[Panel.famaMacBeth]] (which pools per-PERIOD
  * slopes with equal weights) with the weighted two-level pooling.
  *
  * Everything is closed-form: the fixed pass is one aggregate
  * (Σw, Σwβ, Σwβ², Σw² with w = 1/se²); Q folds algebraically as
  * Σwβ² − (Σwβ)²/Σw (no second scan for the mean); τ² = max(0,
  * (Q − (k−1))/c) with c = Σw − Σw²/Σw; the random-effects pass
  * re-weights by 1/(se² + τ²) in a second aggregate over the study
  * frame with the one-row prior broadcast. Study frames are
  * segment-sized but nothing here breaks if they are not: both passes
  * are map-side-combined aggregates. DuckDB replays every form.
  */
object Meta {

  /** One row: k, beta_fixed, se_fixed, q_stat, tau2, i2, beta_random,
    * se_random (6dp). Studies with null or non-positive `se` are
    * EXCLUDED (count them upstream); k ≤ 1 leaves the heterogeneity
    * fields null (Q needs ≥ 2 studies) with the fixed fields equal to
    * the single study.
    */
  def combine(df: DataFrame, effectCol: String, seCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val b = col(effectCol).cast("double")
    val se = col(seCol).cast("double")
    val w = lit(1.0) / (se * se)
    val studies = df.where(se.isNotNull && se > 0)

    val fixed = studies
      .agg(
        count(lit(1)).as("k"),
        sum(w).as("sw"),
        sum(w * b).as("swb"),
        sum(w * b * b).as("swbb"),
        sum(w * w).as("sww"))
      .withColumn("q_raw",
        when(col("k") > 1, col("swbb") - col("swb") * col("swb") / col("sw")))
      .withColumn("c_dl",
        when(col("k") > 1, col("sw") - col("sww") / col("sw")))
      .withColumn("tau2_raw",
        when(col("k") > 1,
          greatest(lit(0.0),
            (col("q_raw") - (col("k") - lit(1)).cast("double")) / col("c_dl"))))
      .localCheckpoint(true)

    val wStar = lit(1.0) / (se * se + col("tau2_raw"))
    val rand = studies
      .crossJoin(broadcast(fixed))
      .agg(
        first(col("k")).as("k"), first(col("sw")).as("sw"),
        first(col("swb")).as("swb"), first(col("q_raw")).as("q_raw"),
        first(col("tau2_raw")).as("tau2_raw"),
        sum(when(col("tau2_raw").isNotNull, wStar)).as("swr"),
        sum(when(col("tau2_raw").isNotNull, wStar * b)).as("swrb"))

    rand.select(
      col("k").cast("long").as("k"),
      q6(col("swb") / col("sw")).as("beta_fixed"),
      q6(sqrt(lit(1.0) / col("sw"))).as("se_fixed"),
      q6(col("q_raw")).as("q_stat"),
      q6(col("tau2_raw")).as("tau2"),
      when(col("q_raw") > 0,
        q6(greatest(lit(0.0),
          (col("q_raw") - (col("k") - lit(1)).cast("double")) / col("q_raw"))))
        .as("i2"),
      q6(col("swrb") / col("swr")).as("beta_random"),
      q6(sqrt(lit(1.0) / col("swr"))).as("se_random"))
  }
}
