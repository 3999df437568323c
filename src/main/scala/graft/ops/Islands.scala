package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval union per key — merge overlapping (or
  * touching) [start, end] spans into maximal islands and report per-key
  * coverage: actual distinct activity time under concurrent sessions,
  * SLA uptime union, span-audit consolidation. The UNION complement of
  * [[RangeJoin.intervalOverlap]] (which reports the pairwise
  * INTERSECTIONS).
  *
  * The classic two-window closed form, both keyed (never global): an
  * island STARTS where the span's start exceeds the running max end of
  * every earlier span (strictly — touching endpoints merge, the closed
  * convention of Z4/Z15); the island id is the running count of such
  * starts; one groupBy((key, island)) emits the merged spans. Exact
  * integer arithmetic end to end for integer bounds.
  */
object Islands {

  /** One row per merged island: key, island (1-based per key),
    * island_start, island_end, n_spans, covered (= end − start), with
    * per-key totals n_islands / total_covered repeated (keyed window).
    */
  def coverage(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val marked = df
      .withColumn("__new", when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = marked
      .groupBy(col(keyCol), col("__isl").as("island"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_spans"))
      .withColumn("covered", col("island_end") - col("island_start"))
    val perKey = Window.partitionBy(col(keyCol))
    islands
      .withColumn("n_islands", count(lit(1)).over(perKey))
      .withColumn("total_covered", sum(col("covered")).over(perKey))
  }
}
