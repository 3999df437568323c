package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the "what changed between crawls" audit that
  * gates incremental pipelines (re-tokenize/re-embed/re-dedup ONLY what
  * moved, bill the rest as carry-over). Aligns two corpus versions on
  * the id, classifies every id `added` / `removed` / `unchanged` /
  * `edited`, and for edited documents measures chunk-level churn with
  * [[graft.dedup.CdcChunks]] content-defined chunks: `retained_chars` =
  * chars of the NEW version living in chunks whose hash also occurs in
  * the OLD version of the same document. Content-defined boundaries
  * make the churn measure edit-local: a header swap on a 10 KB doc
  * reports ~header-sized churn, not a 100% rewrite (the fixed-stride
  * failure the P17 spec plants).
  *
  * Scale shape: ONE full-outer join on the id (both snapshots shuffle
  * once, text moves once); chunking runs only over the EDITED slice
  * (typically a few % of a crawl), and the per-doc chunk comparison is
  * an (id, hash) semi-join — chunk text never shuffles. Nothing is
  * collected.
  */
object CorpusDiff {

  /** (idCol, status, old_chars, new_chars, retained_chars) per id in
    * either snapshot. `retained_chars`: full length for `unchanged`, the
    * chunk-retained count for `edited`, 0 for `added`, null for
    * `removed`.
    */
  def diff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame = {
    val o = oldSnap.select(col(idCol), col(textCol).as("__ot"))
    val n = newSnap.select(col(idCol), col(textCol).as("__nt"))
    val j = o
      .join(n, Seq(idCol), "full_outer")
      .withColumn(
        "status",
        when(col("__ot").isNull, "added")
          .when(col("__nt").isNull, "removed")
          .when(col("__ot") === col("__nt"), "unchanged")
          .otherwise("edited"))

    val edited = j.where(col("status") === "edited")
    val newCh = graft.dedup.CdcChunks
      .chunks(edited.select(col(idCol), col("__nt").as("text")), "text", idCol, window, divisor)
    val oldHashes = graft.dedup.CdcChunks
      .chunks(edited.select(col(idCol), col("__ot").as("text")), "text", idCol, window, divisor)
      .select(col(idCol), col("chunk_hash"))
      .distinct()
    val retained = newCh
      .join(oldHashes, Seq(idCol, "chunk_hash"), "left_semi")
      .groupBy(col(idCol))
      .agg(sum(col("chunk_len").cast("long")).as("__ret"))

    j.join(retained, Seq(idCol), "left")
      .select(
        col(idCol),
        col("status"),
        length(col("__ot")).cast("long").as("old_chars"),
        length(col("__nt")).cast("long").as("new_chars"),
        when(col("status") === "unchanged", length(col("__nt")).cast("long"))
          .when(col("status") === "edited", coalesce(col("__ret"), lit(0L)))
          .when(col("status") === "added", lit(0L))
          .as("retained_chars"))
  }

  /** One-row rollup of [[diff]]: id counts per status plus total churned
    * chars (new chars not retained) — the crawl-over-crawl dashboard
    * line. A #statuses-group aggregate over the diff, nothing more.
    */
  def summary(diffed: DataFrame): DataFrame =
    diffed
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("new_chars"), lit(0L))).as("new_chars"),
        sum(coalesce(col("new_chars") - coalesce(col("retained_chars"), lit(0L)), lit(0L)))
          .as("churned_chars"))
}
