package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-fairness audit of a binary classifier — the standard
  * release-gate table beside [[Eval]]'s aggregate metrics: per
  * protected group, base rate, predicted-positive rate (demographic
  * parity), TPR/FPR (equalized odds), and precision (ppv — PRECISION is a SQL type keyword), plus each rate's
  * ratio against a designated reference group (the four-fifths-rule
  * reading: parity_ratio < 0.8 flags disparate impact).
  *
  * One (group)-keyed count aggregate — group-cardinality output — and
  * a broadcast join against the reference group's row. All cells are
  * integer counts; every rate is one division, so the table replays
  * exactly. Degenerate denominators (a group with no positives, or no
  * negatives) yield null rates rather than failing — absence of
  * evidence is a review flag, not a crash.
  */
object Fairness {

  def groupRates(
      df: DataFrame,
      groupCol: String,
      labelCol: String,
      predCol: String,
      refGroup: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val y = col(labelCol).cast("int"); val p = col(predCol).cast("int")
    val per = df.groupBy(col(groupCol).as("g")).agg(
      count(lit(1)).as("n"),
      sum(y).cast("long").as("n_pos"),
      sum(p).cast("long").as("n_pred_pos"),
      sum(when(y === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(y === 0 && p === 1, 1L).otherwise(0L)).as("fp"))
    def rate(num: Column, den: Column) =
      when(den > 0, q6(num.cast("double") / den.cast("double")))
    val rated = per.select(
      col("g"), col("n"), col("n_pos"), col("n_pred_pos"), col("tp"), col("fp"),
      rate(col("n_pos"), col("n")).as("base_rate"),
      rate(col("n_pred_pos"), col("n")).as("pred_pos_rate"),
      rate(col("tp"), col("n_pos")).as("tpr"),
      rate(col("fp"), col("n") - col("n_pos")).as("fpr"),
      rate(col("tp"), col("n_pred_pos")).as("ppv"))
    val ref = rated.where(col("g") === refGroup).select(
      col("pred_pos_rate").as("__ref_ppr"),
      col("tpr").as("__ref_tpr"),
      col("fpr").as("__ref_fpr"))
    def ratio(c: Column, refC: Column) =
      when(refC > 0 && c.isNotNull, q6(c / refC))
    rated
      .crossJoin(broadcast(ref)) // 1-row reference
      .select(
        col("g").as(groupCol),
        col("n"), col("n_pos"), col("n_pred_pos"), col("tp"), col("fp"),
        col("base_rate"), col("pred_pos_rate"), col("tpr"), col("fpr"), col("ppv"),
        ratio(col("pred_pos_rate"), col("__ref_ppr")).as("parity_ratio"),
        ratio(col("tpr"), col("__ref_tpr")).as("tpr_ratio"),
        ratio(col("fpr"), col("__ref_fpr")).as("fpr_ratio"))
  }
}
