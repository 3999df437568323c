package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline attrition audit — the per-stage funnel accounting every
  * serious training-data pipeline publishes (Dolma's and RefinedWeb's
  * attrition tables): for each document, WHICH gate dropped it first;
  * for each stage, how many documents reached it and how many it
  * removed. graft's gates already exist as operators (quality,
  * repetition, language ID, exact dedup, decontamination, ...); this
  * composes their verdicts instead of their filters, so one pass over
  * the corpus yields the full audit rather than a silent shrinking.
  *
  * Scale shape: [[firstFailed]] is a pure row-local CASE over
  * already-computed gate columns (no shuffle of its own — the gate
  * columns carry whatever their operators needed); [[funnel]] reduces
  * the verdict frame to #stages+1 counts in ONE map-side-combined
  * aggregate and finishes the cumulative arithmetic on the driver.
  */
object Attrition {

  /** Add `first_failed`: the name of the FIRST stage (in the given
    * order) whose keep-predicate is false, or null when every stage
    * passes. Predicates are ordinary Columns over `df`.
    */
  def firstFailed(df: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    df.withColumn(
      "first_failed",
      stages.foldRight(lit(null).cast("string")) { case ((name, keep), later) =>
        when(!keep, lit(name)).otherwise(later)
      })

  /** Funnel summary from a [[firstFailed]] frame: one row per stage in
    * order — (stage, n_in, n_dropped, n_out) — plus the implied final
    * `n_out` of the last stage = kept documents. One tiny aggregate
    * (#stages+1 groups) + driver cumulative sums.
    */
  def funnel(verdicts: DataFrame, stageNames: Seq[String]): DataFrame = {
    val spark = verdicts.sparkSession
    import spark.implicits._
    val counts = verdicts
      .groupBy(col("first_failed"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
      .toMap
    val total = counts.values.sum
    var reached = total
    val rows = stageNames.map { s =>
      val dropped = counts.getOrElse(s, 0L)
      val row = (s, reached, dropped, reached - dropped)
      reached -= dropped
      row
    }
    rows.toDF("stage", "n_in", "n_dropped", "n_out")
  }
}
