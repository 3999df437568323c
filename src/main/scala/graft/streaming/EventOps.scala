package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2 S1–S3). Written against plain
  * DataFrames so the identical column algebra compiles against both a
  * batch scan and `readStream` (see [[EventStream]] for the streaming
  * compilation with watermarks).
  */
object EventOps {

  /** Tumbling hourly aggregate per event type. `ws` is the window start
    * as epoch seconds (timezone-free parity with SQL oracles).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("ws"),
        col("event_type")
      )
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  /** Gap-based sessionization: a new session starts when a user is idle
    * longer than `gapMinutes`. One shuffle on user_id; both window
    * passes reuse the same partitioning.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = gapMinutes * 60L * 1000L
    val tsMs = unix_millis(col("ts"))
    val brk = when(
      lag(tsMs, 1).over(w).isNull || tsMs - lag(tsMs, 1).over(w) > gapMs,
      1L
    ).otherwise(0L)
    events
      .withColumn("brk", brk)
      .withColumn(
        "session",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy(col("user_id"), col("session"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
  }

  /** Semi-structured extraction from the JSON `props` column. */
  def propsKAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("k")), 6).as("avg_k"),
        max(col("k")).as("max_k")
      )
}
