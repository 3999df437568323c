package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cohort LTV curve — cumulative revenue per user by cohort age: the
    * payback readout beside [[retention]]. Cohort = first-seen day,
    * age = revenue day − cohort day; revenue in integer CENTS so the
    * cumulative is exact; `cum_rev_per_user` divides by the FIXED
    * cohort size (not survivors — the LTV convention). The cumulative
    * window is keyed by cohort (ages per cohort are day-bounded,
    * never corpus-sized). Returns (cohort_day, age, cohort_size,
    * rev_cents, cum_rev_cents, cum_rev_per_user 6dp).
    */
  def ltv(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      revenueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(
      col(userCol).as("u"),
      floor(unix_timestamp(col(tsCol).cast("timestamp")) / 86400L).as("day"),
      round(col(revenueCol).cast("double") * 100).cast("long").as("cents"))
    val firstDay = base.groupBy("u").agg(min("day").as("cohort_day"))
    val sizes = firstDay.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    val perAge = base
      .join(firstDay, Seq("u"))
      .withColumn("age", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "age")
      .agg(sum("cents").as("rev_cents"))
    val w = Window.partitionBy("cohort_day").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    perAge
      .withColumn("cum_rev_cents", sum("rev_cents").over(w))
      .join(broadcast(sizes), Seq("cohort_day"))
      .select(
        col("cohort_day"), col("age"), col("cohort_size"),
        col("rev_cents"), col("cum_rev_cents"),
        q6(col("cum_rev_cents").cast("double") / lit(100.0) /
          col("cohort_size").cast("double")).as("cum_rev_per_user"))
  }
}
