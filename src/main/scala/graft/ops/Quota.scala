package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key quota capping over time buckets — crawl politeness and
  * source-balance as a BATCH operator: keep at most `limit` rows per
  * (key, time bucket) in deterministic (ts, tie) order, flag the rest.
  * The data-mixing companion to [[Sampling.takePerStratum]] (which caps
  * per stratum without a time axis) and [[graft.ops.TokenBudget]]
  * (which budgets tokens, not rows): "at most N pages per domain per
  * hour", "at most N samples per user per day".
  *
  * One keyed window over (key, bucket) — row_number in (ts, tie) order,
  * kept = rn ≤ limit. Bucket arithmetic is integer floor division of
  * epoch seconds; everything is engine-exact and SQL-replayable.
  */
object Quota {

  /** Adds `bucket` (epoch-second floor-divided by `bucketSec`) and
    * `kept` (1/0). Rows keep their original columns; the caller filters
    * `kept = 1` or audits the overflow.
    */
  def perKeyWindow(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      bucketSec: Long,
      limit: Int): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    require(limit >= 1, "limit must be >= 1")
    val bucket = expr(s"unix_timestamp($tsCol) div $bucketSec")
    val w = Window.partitionBy(col(keyCol), col("bucket"))
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("bucket", bucket)
      .withColumn("__rn", row_number().over(w))
      .withColumn("kept", when(col("__rn") <= limit, 1L).otherwise(0L))
      .drop("__rn")
  }
}
