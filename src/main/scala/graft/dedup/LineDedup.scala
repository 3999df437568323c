package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level exact deduplication — the C4/RefinedWeb preprocessing
  * stage: a line that occurs repeatedly ACROSS the corpus (boilerplate
  * headers, navigation chrome, license banners) is removed everywhere
  * except its earliest occurrence, while each document's remaining lines
  * keep their order. Complements [[SpanDedup]]/[[RepeatedSpans]], which
  * audit token spans inside the text; this operator works on the
  * document's own line structure.
  *
  * Scale shape (100 TB): lines shuffle ONCE as 8-byte xxhash64 keys for
  * the occurrence count (map-side combined); the duplicated-line table —
  * only lines with ≥ minCount occurrences, carrying their keeper
  * (doc, pos) — is corpus-boilerplate-sized, so the planner broadcasts
  * it back onto the exploded lines; reassembly is one groupBy(doc) whose
  * per-group state is the document itself. No window functions, no
  * full-text shuffle. Grouping by hash instead of line text is the same
  * 2⁻⁶⁴-collision trade as [[Exact]]/[[SimHash]] (SURVEY §8b).
  */
object LineDedup {

  /** One row per input document: `idCol`, `clean_text` (surviving lines
    * joined with `delim`, order preserved), `n_removed`, `n_lines`.
    * A line occurrence survives when its line's total occurrence count
    * is < minCount, or when it is the keeper: the lexicographically
    * earliest (doc id, position) occurrence corpus-wide.
    *
    * `broadcastDupLimit`: the duplicated-line table is only broadcast
    * back onto the exploded lines when it holds at most this many rows
    * (counted — one action over the persisted agg, the FixedEffects
    * broadcast-gate pattern). A heavily near-duplicated corpus — the
    * exact case dedup targets — can make that table corpus-sized; above
    * the gate the planner picks a shuffle join instead of OOMing the
    * executors on a forced broadcast. The persisted dup table (bounded
    * by MEMORY_AND_DISK) is released by the caller's session cache
    * sweep.
    */
  def clean(
      df: DataFrame,
      textCol: String,
      idCol: String,
      delim: String = "\n",
      minCount: Int = 2,
      broadcastDupLimit: Long = 5000000L
  ): DataFrame = {
    require(minCount >= 2, "minCount < 2 would remove every line")
    val lines = df
      .select(col(idCol), posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
        .as(Seq("__pos", "__line")))
      .withColumn("__k", xxhash64(col("__line")))

    // duplicated lines only: count + earliest (doc, pos) occurrence
    val dup = lines
      .groupBy(col("__k"))
      .agg(
        count(lit(1)).as("__cnt"),
        min(struct(col(idCol).as("d"), col("__pos").as("p"))).as("__keep"))
      .filter(col("__cnt") >= minCount)
      .select(col("__k"), col("__keep"))
      .persist()

    val kept: Column = col("__keep").isNull ||
      (col("__keep.d") === col(idCol) && col("__keep.p") === col("__pos"))

    val dupSide = if (dup.count() <= broadcastDupLimit) broadcast(dup) else dup

    lines
      .join(dupSide, Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(kept, struct(col("__pos"), col("__line"))))),
            s => s("__line")),
          delim).as("clean_text"),
        sum(when(kept, 0L).otherwise(1L)).as("n_removed"),
        count(lit(1)).as("n_lines"))
  }
}
