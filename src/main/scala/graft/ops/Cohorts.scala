package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream — the companion to
  * [[Funnel]]: users grouped by their first-activity period, each
  * cohort's share still active k periods later. Periods are integer
  * epoch-day buckets (floor(unix/86400)) rather than calendar
  * truncation, so the arithmetic is engine-independent (no
  * week-start/locale conventions to match).
  *
  * Scale shape: one distinct over (user, day) — the only corpus-sized
  * aggregate; first-activity per user is a min over it; cohort sizes
  * broadcast back. All integers + one final ratio.
  */
object Cohorts {

  /** (cohort_day, day_offset, n_active, cohort_size, retention):
    * n_active = distinct cohort users with any event at
    * cohort_day + day_offset; offset 0 is the full cohort by
    * construction.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val active = events
      .select(
        col(userCol),
        floor(unix_timestamp(col(tsCol).cast("timestamp")) / 86400L).as("__day"))
      .distinct()
    val firstDay = active
      .groupBy(col(userCol))
      .agg(min("__day").as("cohort_day"))
    val sizes = firstDay
      .groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    active
      .join(firstDay, Seq(userCol))
      .withColumn("day_offset", col("__day") - col("cohort_day"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col(userCol)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn(
        "retention",
        round(col("n_active").cast("double") / col("cohort_size").cast("double"), 4))
  }
}
