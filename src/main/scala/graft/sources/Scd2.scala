package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge — effective-dated dimension
  * maintenance, the warehouse-side companion to [[Rollup]]'s incremental
  * facts: apply a batch of updates to a versioned dimension so history
  * is preserved (every key's attribute timeline stays queryable — the
  * "what segment was this customer in when the order shipped" join that
  * as-of joins ([[graft.ops.AsOf]]) consume).
  *
  * Contract: `dim` is an SCD2 table — one row per (key, version) with
  * `valid_from`, `valid_to` (null = open) and `is_current`; `updates`
  * carries one candidate row per key (enforced — duplicate keys in one
  * batch are ambiguous and raise) plus the effective timestamp column.
  * For each update key:
  *
  *   - unknown key               → new open version
  *   - known, tracked cols equal → no-op (idempotent re-merges)
  *   - known, any tracked differs→ close the current version at eff_ts
  *                                 and open a successor
  *
  * Historical (non-current) rows pass through untouched. Null-safe
  * comparison (`<=>`) on every tracked column.
  *
  * Scale shape: ONE full-outer join between the current slice and the
  * update batch on the key (broadcast when the batch is small — left to
  * the planner), historical rows unioned back without a shuffle.
  * Nothing is collected; a 10-billion-row dimension merges as a single
  * key-partitioned pass.
  */
object Scd2 {

  /** Build the initial SCD2 table from a plain snapshot. */
  def initial(snapshot: DataFrame, key: String, tracked: Seq[String], from: Long): DataFrame =
    snapshot
      .select((key +: tracked).map(col): _*)
      .withColumn("valid_from", lit(from))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))

  def merge(
      dim: DataFrame,
      updates: DataFrame,
      key: String,
      tracked: Seq[String],
      effCol: String
  ): DataFrame = {
    // one-candidate-per-key guard rides the row path (the TrainingShards
    // pattern — a zero-row side plan would be optimized away unevaluated)
    val cnt = updates.groupBy(col(key)).agg(count(lit(1)).as("__c"))
    val guarded = updates
      .join(cnt, Seq(key))
      .where(
        when(
          col("__c") > 1,
          raise_error(concat(
            lit(s"Scd2.merge: duplicate update rows for key $key="),
            col(key).cast("string")))).isNull)
      .drop("__c")

    val hist = dim.where(!col("is_current"))
    val cur = dim.where(col("is_current"))

    val u = guarded.select(
      (col(key).as("__uk") +: col(effCol).as("__eff") +:
        tracked.map(c => col(c).as(s"__u_$c"))): _*)

    val joined = cur.join(u, col(key) === col("__uk"), "full_outer")
    val changed = tracked
      .map(c => !(col(c) <=> col(s"__u_$c")))
      .reduce(_ || _)

    val dimCols = (key +: tracked).map(col) ++
      Seq(col("valid_from"), col("valid_to"), col("is_current"))

    // current rows: untouched (no update or identical), or closed
    val kept = joined
      .where(col(key).isNotNull && (col("__uk").isNull || !changed))
      .select(dimCols: _*)
    val closed = joined
      .where(col(key).isNotNull && col("__uk").isNotNull && changed)
      .select(
        ((key +: tracked).map(col) ++ Seq(
          col("valid_from"),
          col("__eff").cast("long").as("valid_to"),
          lit(false).as("is_current"))): _*)
    // successors + brand-new keys: one open version from the update row
    val opened = joined
      .where(col("__uk").isNotNull && (col(key).isNull || changed))
      .select(
        (Seq(col("__uk").as(key)) ++ tracked.map(c => col(s"__u_$c").as(c)) ++ Seq(
          col("__eff").cast("long").as("valid_from"),
          lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current"))): _*)

    hist.select(dimCols: _*)
      .unionByName(kept)
      .unionByName(closed)
      .unionByName(opened)
  }
}
