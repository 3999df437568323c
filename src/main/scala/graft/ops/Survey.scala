package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stratified survey estimation with finite-population correction
  * (Cochran 1977 ch. 5) — the design-based mean/total a sampled audit
  * reports back to the full corpus: each stratum h contributes
  * weight W_h = N_h/N from the POPULATION frame, mean ȳ_h from the
  * SAMPLE, and variance W_h²·(1 − n_h/N_h)·s²_h/n_h — the FPC term is
  * what naive SE computations drop, overstating uncertainty exactly
  * when the audit sampled a large fraction of a stratum. This engine's
  * sampling side ([[Sampling]]/[[Quota]]) produces such samples; this
  * closes the loop with the estimator.
  *
  * Scale shape: ONE groupBy over the sample (n, Σy, Σy²) + one
  * broadcast-sized join against the strata-cardinality population
  * counts; overall mean/SE are strata-sized window sums. Strata present
  * in the population but unsampled are REPORTED with null mean (their
  * weight is missing mass — dropping them silently would bias the
  * estimate and hide the coverage gap).
  */
object Survey {

  private def q6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)

  /** @param pop (strataCol, `n_pop`) population counts per stratum.
    * Returns one row per POPULATION stratum: n_sample, n_pop, w (share
    * of population), mean (null when unsampled), plus the overall
    * stratified mean, its FPC standard error, and the ±1.959964 normal
    * CI repeated on every row (strata-sized window — free).
    *
    * EAGER INPUT VALIDATION (one sample scan, strata-sized result,
    * reused by the estimator): a sample stratum ABSENT from the
    * population frame would silently vanish through the pop-side join,
    * biasing the estimate with no coverage signal — it fails instead;
    * a stratum sampled MORE rows than its claimed population
    * (n_h > N_h) would make the FPC factor negative and the SE NaN —
    * the population counts are wrong, so that fails too.
    */
  def stratifiedMean(
      sample: DataFrame,
      pop: DataFrame,
      strataCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val y = col(valueCol).cast("double")
    val per = sample
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).cast("double").as("ns"),
        sum(y).as("sy"),
        sum(y * y).as("syy"))
      .localCheckpoint(true)
    val popKeys = pop.select(col(strataCol), col("n_pop").cast("double").as("__np_chk"))
    val orphans = per.join(popKeys, Seq(strataCol), "left_anti")
      .select(col(strataCol)).limit(5).collect().map(_.get(0))
    require(orphans.isEmpty,
      s"Survey.stratifiedMean: sample strata absent from the population frame " +
        s"(first ${orphans.length}): ${orphans.mkString(", ")} — the pop-side join " +
        "would silently drop their rows and bias the estimate")
    val oversized = per.join(popKeys, Seq(strataCol))
      .where(col("ns") > col("__np_chk"))
      .select(col(strataCol)).limit(5).collect().map(_.get(0))
    require(oversized.isEmpty,
      s"Survey.stratifiedMean: strata sampled more rows than their claimed population " +
        s"(first ${oversized.length}): ${oversized.mkString(", ")} — the FPC term " +
        "1 - n_h/N_h would go negative; fix the population counts")
    val joined = pop
      .select(col(strataCol), col("n_pop").cast("double").as("np"))
      .join(per, Seq(strataCol), "left")
    val w = Window.partitionBy(lit(1)) // strata-sized frame: bounded
    val nTot = sum(col("np")).over(w)
    val mean = col("sy") / col("ns")
    val s2 = (col("syy") - col("sy") * col("sy") / col("ns")) / (col("ns") - 1.0)
    val varTerm =
      when(col("ns") >= 2,
        (col("np") / nTot) * (col("np") / nTot) *
          (lit(1.0) - col("ns") / col("np")) * s2 / col("ns"))
    // the stratified estimator is UNDEFINED if any stratum is unsampled
    // (its mean contributes unknown mass): overall columns go null
    // rather than silently renormalizing — the per-row nulls say which
    // strata to sample next
    val anyMissing = max(when(col("ns").isNull || col("ns") < 2, 1).otherwise(0)).over(w)
    val overallMean = when(anyMissing === 0, sum((col("np") / nTot) * mean).over(w))
    val overallSe = when(anyMissing === 0, sqrt(sum(varTerm).over(w)))
    joined
      .select(
        col(strataCol),
        coalesce(col("ns"), lit(0.0)).cast("long").as("n_sample"),
        col("np").cast("long").as("n_pop"),
        q6(col("np") / nTot).as("w"),
        q6(mean).as("mean"),
        q6(overallMean).as("mean_stratified"),
        q6(overallSe).as("se_fpc"),
        q6(overallMean - lit(1.959964) * overallSe).as("ci_lo"),
        q6(overallMean + lit(1.959964) * overallSe).as("ci_hi"))
  }
}
