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
}
