package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration across heterogeneous sources — the step between
  * "every doc has a quality score" and "one global threshold": raw
  * scores are NOT comparable across sources (a news site's median
  * quality differs from a forum's), so per-source selection uses
  * within-group normalized scores (the RefinedWeb/CCNet per-bucket
  * threshold idea).
  *
  *   - `percentileWithin`: percent_rank of the score inside each group
  *     (ties share a rank — stable under any input order).
  *   - `robustZ`: (x − median) / (1.4826·MAD) — outlier gauge immune
  *     to the heavy tails that wreck a mean/σ z-score. Exact
  *     median/MAD via the sort-based percentile aggregate: right up
  *     to ~10^8 rows per group; beyond that the [[graft.text.Vocab]]
  *     GK-quantile path (T13b) supplies the approximate alternative.
  *
  * Both are window/aggregate closed forms — fully DuckDB-replayable.
  */
object Calibrate {

  /** Adds `pct_rank` (4dp): percent_rank of `scoreCol` within each
    * group. One sort-shuffle keyed on the group columns.
    */
  def percentileWithin(df: DataFrame, scoreCol: String, groupCols: Seq[String]): DataFrame =
    df.withColumn(
      "pct_rank",
      round(percent_rank().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(scoreCol))), 4))

  /** Adds `robust_z` (4dp) plus the per-group `med` and `mad` it used.
    * Degenerate groups (MAD = 0: over half the values identical) get
    * robust_z = 0 rather than ±∞ — flagged by mad = 0 in the output.
    */
  def robustZ(df: DataFrame, scoreCol: String, groupCols: Seq[String]): DataFrame = {
    val meds = df
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($scoreCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(meds), groupCols)
    val mads = withMed
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(abs($scoreCol - med), 0.5)").as("mad"))
    withMed
      .join(broadcast(mads), groupCols)
      .withColumn(
        "robust_z",
        when(col("mad") > 0,
          round((col(scoreCol) - col("med")) / (lit(1.4826) * col("mad")), 4))
          .otherwise(lit(0.0)))
  }
}
