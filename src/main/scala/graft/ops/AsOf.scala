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

  /** Nearest-neighbor time join (pandas `merge_asof(direction=
    * 'nearest')`): each left row takes the payload of the CLOSEST right
    * row within `toleranceSec` — backward on an exact distance tie.
    * Millisecond resolution; emits `matched_dist_ms` (null = no match,
    * payload nulled).
    *
    * Shape: the same union-window trick as [[joinAsOf]] run in BOTH
    * directions — the forward pass re-sorts DESCENDING and reuses the
    * growing (unbounded preceding, current) frame rather than a
    * (current, unbounded following) frame, which Spark re-scans per
    * row (the shrinking-frame hazard, SURVEY §8g). Two sorts, one key
    * shuffle, zero joins.
    *
    * Contract: right rows unique per (keys, rightTs) — duplicate
    * right timestamps make "the nearest row" ill-defined (dedupe with
    * [[graft.ops.Stats.modeByGroup]]-style keep rules first).
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      toleranceSec: Long
  ): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val rightSchema = right.schema
    val l0 = left
      .withColumn("__ats", expr(s"unix_millis(cast($leftTs as timestamp))"))
      .withColumn("__side", lit(1))
      .withColumn("__rts", lit(null).cast("long"))
    val l = payload.foldLeft(l0) { (acc, p) =>
      acc.withColumn(p, lit(null).cast(rightSchema(p).dataType))
    }
    val leftSchema = left.schema
    val nonKeyLeftCols = left.columns.filterNot(keys.contains)
    val rBase = right
      .select(keys.map(col) ++ payload.map(col) :+
        expr(s"unix_millis(cast($rightTs as timestamp))").as("__ats"): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rts", col("__ats"))
    val r = nonKeyLeftCols.foldLeft(rBase) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(leftSchema(c).dataType))
    }
    // right rows sort before left at equal ts in BOTH directions
    // (__side 0 < 1 ascending; descending sorts by (-ats, side)) so an
    // exact-timestamp right row is visible to both passes
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ats").desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var u = l.unionByName(r)
    payload.foreach { p =>
      u = u
        .withColumn(s"__b_$p", last(col(p), ignoreNulls = true).over(wB))
        .withColumn(s"__f_$p", last(col(p), ignoreNulls = true).over(wF))
    }
    u = u
      .withColumn("__brts", last(col("__rts"), ignoreNulls = true).over(wB))
      .withColumn("__frts", last(col("__rts"), ignoreNulls = true).over(wF))
    val db = col("__ats") - col("__brts")
    val df_ = col("__frts") - col("__ats")
    val backward = col("__frts").isNull || (col("__brts").isNotNull && db <= df_)
    val dist = when(backward, db).otherwise(df_)
    val matched = dist.isNotNull && dist <= toleranceSec * 1000L
    val out0 = u.where(col("__side") === 1)
      .withColumn("matched_dist_ms", when(matched, dist))
    val out = payload.foldLeft(out0) { (acc, p) =>
      acc.withColumn(p,
        when(!matched, lit(null).cast(rightSchema(p).dataType))
          .when(backward, col(s"__b_$p"))
          .otherwise(col(s"__f_$p")))
    }
    out.drop((payload.flatMap(p => Seq(s"__b_$p", s"__f_$p")) ++
      Seq("__ats", "__side", "__rts", "__brts", "__frts")): _*)
  }
}
