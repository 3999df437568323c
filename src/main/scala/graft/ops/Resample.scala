package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid resampling per key — the pandas `resample`/`asfreq` pair
  * re-expressed for a corpus of series: every key's irregular events
  * land on a regular `stepSec` grid, either as forward-filled level
  * samples ([[fillForward]] — sensor/price style) or as OHLC candles
  * ([[ohlc]] — the standard bar aggregate).
  *
  * Scale shape: the observation pass is one (key, bucket) aggregate;
  * the grid explodes `sequence(min_bucket, max_bucket, step)` PER KEY
  * (grid rows = span/step per key — bounded by the series' time range,
  * not by event count; a sparse key with a year of span at 1-minute
  * steps emits 525k rows — pick the step for the span you mean).
  * Forward fill is one `last(ignoreNulls)` over the keyed grid order —
  * sharded per key, never global.
  */
object Resample {

  /** One row per (key, bucket) from each key's first to last
    * observation: `v` = last observed value at or before the bucket
    * (per-bucket last by (ts, tie), then forward-filled), `observed` =
    * 1 where the bucket had a real observation. Values pass through
    * untouched (no arithmetic → exact on any engine).
    */
  def fillForward(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      stepSec: Long): DataFrame = {
    require(stepSec > 0, "Resample.fillForward: stepSec must be positive")
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSec) * stepSec).cast("long")
    val base = df.select(
      col(keyCol).as("k"), bucket.as("bucket"),
      col(tsCol).as("ts"), col(tieCol).as("tie"),
      col(valueCol).cast("double").as("v"))
    val obs = base
      .withColumn("rn", row_number().over(
        Window.partitionBy("k", "bucket").orderBy(col("ts").desc, col("tie").desc)))
      .where(col("rn") === 1)
      .select(col("k"), col("bucket"), col("v").as("v_obs"))
    val span = base.groupBy("k").agg(min("bucket").as("b0"), max("bucket").as("b1"))
    val grid = span.select(
      col("k"),
      explode(sequence(col("b0"), col("b1"), lit(stepSec))).as("bucket"))
    val w = Window.partitionBy("k").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs, Seq("k", "bucket"), "left")
      .withColumn("v", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("observed", when(col("v_obs").isNotNull, 1L).otherwise(0L))
      .select(col("k").as(keyCol), col("bucket"), col("v"), col("observed"))
  }

  /** OHLC candles: one row per (key, bucket) THAT HAS observations
    * (no gap rows — compose with [[fillForward]] for a dense grid):
    * open/close are the first/last value by (ts, tie), high/low the
    * extremes, n the tick count, vsum the 6dp bucket sum.
    */
  def ohlc(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      stepSec: Long): DataFrame = {
    require(stepSec > 0, "Resample.ohlc: stepSec must be positive")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val bucket = (floor(unix_timestamp(col(tsCol)) / stepSec) * stepSec).cast("long")
    val base = df.select(
      col(keyCol).as("k"), bucket.as("bucket"),
      col(tsCol).as("ts"), col(tieCol).as("tie"),
      col(valueCol).cast("double").as("v"))
    val wAsc = Window.partitionBy("k", "bucket").orderBy(col("ts"), col("tie"))
    val marked = base
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("k", "bucket")))
    marked
      .groupBy("k", "bucket")
      .agg(
        max(when(col("rn") === 1, col("v"))).as("open"),
        max("v").as("high"),
        min("v").as("low"),
        max(when(col("rn") === col("cnt"), col("v"))).as("close"),
        count(lit(1)).as("n"),
        q6(sum("v")).as("vsum"))
      .select(col("k").as(keyCol), col("bucket"),
        col("open"), col("high"), col("low"), col("close"), col("n"), col("vsum"))
  }
}
