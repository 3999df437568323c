package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-first re-expression of the reference `Groupby` class
  * (reference: hdfe/groupby.py:7).
  *
  * The reference materializes per-group index lists and runs a Python
  * closure per group. On Spark the same two modes map to declarative
  * plans that Catalyst compiles to codegen'd hash aggregation:
  *
  *  - `aggregate`  == `Groupby.apply(broadcast=False)` — one output row
  *    per group (pandas groupby().agg). One shuffle on the key with
  *    map-side partial aggregation.
  *  - `transform`  == `Groupby.apply(broadcast=True)` — the per-group
  *    statistic broadcast back onto every input row (pandas
  *    groupby().transform). Implemented as aggregate-then-join rather
  *    than a Window: the joined side is `#groups` rows, so AQE turns the
  *    join into a broadcast join and the fact table is never shuffled —
  *    the shape that survives 100 TB.
  */
object Grouped {

  /** One row per group: groupBy(keys).agg(aggs). */
  def aggregate(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Group statistic joined back to every input row (pandas transform).
    * Aggregate names must not collide with input columns.
    */
  def transform(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    val grouped = aggregate(df, keys, aggs)
    df.join(grouped, keys, "left")
  }

  /** Per-group ROLLING statistics over the trailing `window` rows in
    * `orderCol` order (pandas `groupby().rolling(window)`, the panel
    * moving average / running volatility). One shuffle on the group key
    * — the same partitioning [[graft.ops.Lags.makeLags]] uses, so a
    * pipeline computing lags AND rolling stats reuses one exchange.
    * Rows earlier than a full window aggregate over what exists (pandas
    * `min_periods=1` convention).
    */
  def rolling(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      window: Int,
      aggs: Seq[Column => Column],
      valueCol: String,
      names: Seq[String]
  ): DataFrame = {
    require(aggs.length == names.length, "one output name per aggregate")
    require(window >= 1, "window must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(-(window - 1).toLong, org.apache.spark.sql.expressions.Window.currentRow)
    aggs.zip(names).foldLeft(df) { case (acc, (f, n)) =>
      acc.withColumn(n, f(col(valueCol)).over(w))
    }
  }

  /** Per-group EXPANDING statistics — pandas `groupby().expanding()`:
    * each row aggregates everything from its group's start through
    * itself in `orderCol` order (running mean, cumulative max, …). The
    * cumulative ROWS frame is incremental in WindowExec (O(n) per
    * group — NOT the shrinking-frame hazard, SURVEY §8g) and shares
    * [[rolling]]'s single key shuffle.
    */
  def expanding(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      aggs: Seq[Column => Column],
      valueCol: String,
      names: Seq[String]
  ): DataFrame = {
    require(aggs.length == names.length, "one output name per aggregate")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    aggs.zip(names).foldLeft(df) { case (acc, (f, n)) =>
      acc.withColumn(n, f(col(valueCol)).over(w))
    }
  }

  /** Time-RANGE rolling aggregates per key — the event-time sibling of
    * [[rolling]] (which counts ROWS): each row aggregates every row of
    * its key within the trailing `windowSec` seconds of ITS OWN event
    * time (pandas `rolling('7D')`, the "7-day rolling activity"
    * feature). RANGE frames need a numeric order key, so the window
    * runs over epoch seconds; same single key shuffle as `rolling`.
    */
  def rollingByTime(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      windowSec: Long,
      aggs: Seq[Column => Column],
      valueCol: String,
      names: Seq[String]
  ): DataFrame = {
    require(aggs.length == names.length, "one output name per aggregate")
    require(windowSec >= 0, "window must be >= 0 seconds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts_sec"))
      .rangeBetween(-windowSec, org.apache.spark.sql.expressions.Window.currentRow)
    val withSec = df.withColumn("__ts_sec", unix_timestamp(col(tsCol)))
    aggs.zip(names).foldLeft(withSec) { case (acc, (f, n)) =>
      acc.withColumn(n, f(col(valueCol)).over(w))
    }.drop("__ts_sec")
  }
}
