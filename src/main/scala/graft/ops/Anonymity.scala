package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity audit over quasi-identifier columns (Sweeney 2002) —
  * the structural complement of [[graft.text.Redact]]'s in-text
  * scrubbing: PII can be gone from the text while the METADATA combo
  * (source, language, date, ...) still isolates individuals. A release
  * is k-anonymous when every quasi-identifier combination covers at
  * least k rows; combos below k are re-identification risks and get
  * suppressed or generalized before release.
  *
  * One groupBy over the quasi columns — the audit costs one aggregate
  * regardless of how many combos exist.
  */
object Anonymity {

  /** Per-combination audit: (quasiCols..., group_n, at_risk). */
  def audit(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("at_risk", col("group_n") < k)
  }

  /** One-row summary: total combos, risky combos, rows inside risky
    * combos (the suppression cost), and the dataset's actual k
    * (minimum combo size).
    */
  def summary(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame =
    audit(df, quasiCols, k)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("at_risk"), 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("at_risk"), col("group_n")).otherwise(0L)).as("n_risky_rows"),
        min(col("group_n")).as("k_actual"))

  /** The k-anonymized frame: rows in below-k combos suppressed — the
    * minimal-distortion release (generalization hierarchies are domain
    * work; suppression is the universal fallback).
    */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    val risky = audit(df, quasiCols, k)
      .where(col("at_risk"))
      .select(quasiCols.map(col): _*)
    df.join(broadcast(risky), quasiCols, "left_anti")
  }
}
