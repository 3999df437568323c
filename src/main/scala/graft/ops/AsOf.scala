package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for each left row, the payload of the
  * most recent right row with `rightTs <= leftTs` (or `<` when
  * `strict`) within the same key group. The temporal join every panel /
  * feature-store / training-data pipeline needs (price as of trade
  * time, last snapshot as of event time) and one Spark has no built-in
  * operator for.
  *
  * Spark-first composition, not a custom physical operator: tag both
  * sides, UNION them, and run one `last(payload, ignoreNulls)` over a
  * (key, time)-ordered window; left rows then carry the latest
  * preceding right payload. ONE shuffle on the key — the union is
  * co-partitioned and sorted once, exactly the distribution a
  * sort-merge as-of needs at 100 TB — no range condition ever reaches
  * a nested-loop join. Ties (`rightTs == leftTs`): the right row sorts
  * before the left row unless `strict`, matching DuckDB/kdb `>=`
  * semantics. Right rows should be unique per (keys, rightTs) — dedup
  * upstream if not (which copy wins is otherwise nondeterministic).
  */
object AsOf {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false
  ): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val leftTag = if (strict) 0 else 1
    val rightTag = 1 - leftTag

    val rightSchema = right.schema
    val l = payload.foldLeft(
      left.withColumn("__ats", col(leftTs)).withColumn("__side", lit(leftTag))
    ) { (acc, p) => acc.withColumn(p, lit(null).cast(rightSchema(p).dataType)) }

    val leftSchema = left.schema
    val nonKeyLeftCols = left.columns.filterNot(keys.contains)
    val rBase = right
      .select(keys.map(col) ++ payload.map(col) :+ col(rightTs).as("__ats"): _*)
      .withColumn("__side", lit(rightTag))
    val r = nonKeyLeftCols.foldLeft(rBase) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(leftSchema(c).dataType))
    }

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (acc, p) =>
      acc.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === leftTag).drop("__ats", "__side")
  }

  /** [[joinAsOf]] with a match-distance bound (pandas `merge_asof`
    * `tolerance`): payloads from a right row more than `toleranceSec`
    * seconds before the left timestamp are nulled — a stale feature is
    * usually worse than a missing one. Same single key shuffle; the
    * matched right timestamp rides the window fill as one extra column.
    */
  def joinAsOfTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSec: Double,
      strict: Boolean = false
  ): DataFrame = {
    require(toleranceSec >= 0, "tolerance must be >= 0")
    val withMts = right.withColumn("__mts", col(rightTs))
    val joined = joinAsOf(
      left, withMts, keys, leftTs, rightTs, payload :+ "__mts", strict)
    val stale =
      col(leftTs).cast("timestamp").cast("double") -
        col("__mts").cast("timestamp").cast("double") > toleranceSec
    payload
      .foldLeft(joined) { (acc, p) =>
        acc.withColumn(p, when(col("__mts").isNull || stale, lit(null)).otherwise(col(p)))
      }
      .drop("__mts")
  }

  /** Forward as-of: for each left row, the payload of the EARLIEST
    * right row with `rightTs >= leftTs` (or `>` when `strict`) in the
    * key group — "next scheduled maintenance as of this reading", the
    * mirror of the backward default. Identical plan shape: one union,
    * one key shuffle, one ordered window — `first(ignoreNulls)` over
    * the FOLLOWING frame instead of `last` over the preceding one. At
    * equal timestamps the right row sorts after the left row, so it is
    * inside the forward frame exactly when `>=` semantics want it.
    */
  def joinAsOfForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false
  ): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    // equal-ts tie: for >= the right row must sit INSIDE the left
    // row's (current..following) frame, so left sorts first; for > the
    // right row must fall OUTSIDE it, so right sorts first
    val leftTag = if (strict) 1 else 0
    val rightTag = 1 - leftTag

    val rightSchema = right.schema
    val l = payload.foldLeft(
      left.withColumn("__ats", col(leftTs)).withColumn("__side", lit(leftTag))
    ) { (acc, p) => acc.withColumn(p, lit(null).cast(rightSchema(p).dataType)) }

    val leftSchema = left.schema
    val nonKeyLeftCols = left.columns.filterNot(keys.contains)
    val rBase = right
      .select(keys.map(col) ++ payload.map(col) :+ col(rightTs).as("__ats"): _*)
      .withColumn("__side", lit(rightTag))
    val r = nonKeyLeftCols.foldLeft(rBase) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(leftSchema(c).dataType))
    }

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = payload.foldLeft(l.unionByName(r)) { (acc, p) =>
      acc.withColumn(p, first(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === leftTag).drop("__ats", "__side")
  }
}
