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
}
