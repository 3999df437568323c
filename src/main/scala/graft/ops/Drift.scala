package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift test per group — the NUMERIC
  * member of the drift family: [[graft.text.Keyness.jsDivergence]]
  * gauges token distributions, [[graft.streaming.EmbedStream]] gauges
  * embeddings, this gauges any numeric column (doc length, quality
  * score, latency) per source against the pooled corpus:
  * D_g = max over observed values x of |F_g(x) − F_all(x)|, the
  * discrete-data convention (ties allowed; the supremum over step
  * functions is attained at data points).
  *
  * Shape: one (group, value) count aggregate, a dense group×distinct-
  * value frame (the [[graft.text.Keyness]] honest-cost argument —
  * #groups × #distinct values rows, never corpus-sized), cumulative
  * sums per group via one window, and a max per group. Every number is
  * an exact integer ratio until the final rounding.
  */
object Drift {

  /** (groupCol, n_group, d_stat): per-group KS statistic vs the pooled
    * distribution, 4dp.
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val values = counts.groupBy("v").agg(sum("c").as("cv"))
    val groups = counts.groupBy("g").agg(sum("c").as("ng"))
    val total = counts.agg(sum("c").as("n"))

    val dense = groups
      .crossJoin(broadcast(values))
      .join(counts, Seq("g", "v"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(total))

    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("cum_g", sum(col("c")).over(wg))
      .withColumn("cum_all", sum(col("cv")).over(wg))
      .withColumn(
        "gap",
        abs(col("cum_g").cast("double") / col("ng").cast("double") -
          col("cum_all").cast("double") / col("n").cast("double")))
      .groupBy(col("g").as(groupCol))
      .agg(
        max(col("ng")).as("n_group"),
        round(max(col("gap")), 4).as("d_stat"))
  }
}
