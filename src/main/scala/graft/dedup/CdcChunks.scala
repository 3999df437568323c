package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Content-defined chunking (CDC) dedup — the FastCDC/LBFS family
  * (Muthitacharoen et al. 2001) re-expressed relationally: cut each
  * document where the hash of the `window`-char sliding context, taken
  * mod `divisor`, hits 0 (expected chunk length ≈ `divisor` chars),
  * then dedup CHUNKS corpus-wide by hash.
  *
  * Why content-defined instead of fixed-stride: a boundary depends only
  * on the `window` characters ending at it, so an insertion or deletion
  * near the head of a document shifts every byte offset yet leaves
  * every boundary — and therefore every chunk hash — beyond the edit
  * region untouched. Fixed-stride chunking loses ALL alignment after
  * one inserted character; whole-doc hashing loses everything. This is
  * the dedup regime between exact ([[Exact]]) and line-level
  * ([[LineDedup]]): shared boilerplate blocks that don't fall on line
  * boundaries (templated HTML, licence headers re-wrapped, quoted
  * mail) dedup at chunk granularity.
  *
  * Scale shape (100 TB): boundary detection is an embarrassingly
  * parallel per-document explode (window hashes never leave their
  * partition — the groupBy that assembles a document's cut list is
  * keyed by the document id the rows already carry); the only
  * corpus-wide movement is the chunk-hash groupBy, which shuffles
  * (hash, id, len) triples, never chunk text. Cut lists are bounded by
  * document length, the same per-doc bound every span/chunking operator
  * here assumes.
  *
  * The boundary hash is [[SharedHash.md5Long60]] so a DuckDB oracle
  * replays boundaries, chunk hashes, and the dup stats verbatim (q99).
  * A production build would swap in a gear/rolling hash Expression (one
  * table lookup per char instead of one md5 per window) without
  * changing any downstream semantics.
  */
object CdcChunks {

  /** Chunk every document: (idCol, chunk_idx, chunk_start, chunk_len,
    * chunk_hash). 1-based chunk_start; chunks are non-empty, contiguous,
    * and concatenate back to the document exactly. Documents shorter
    * than `window`+1 chars are a single chunk; empty documents yield no
    * rows. A window hash at the final position is not a cut (it would
    * create an empty tail chunk).
    */
  def chunks(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val base = docs
      .select(col(idCol), col(textCol).as("__t"), length(col(textCol)).as("__n"))
      .where(col("__n") >= 1)

    // candidate cut positions w..n-1 (guard n >= w+1: Spark's sequence()
    // runs DESCENDING when stop < start)
    val cuts = base
      .where(col("__n") >= window + 1)
      .select(col(idCol), col("__t"), explode(sequence(lit(window), col("__n") - 1)).as("__i"))
      .where(
        SharedHash.md5Long60(col("__t").substr(col("__i") - (window - 1), lit(window)))
          % divisor === 0)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__i"))).as("__cuts"))

    base
      .join(cuts, Seq(idCol), "left")
      .withColumn("__cuts", coalesce(col("__cuts"), array().cast("array<int>")))
      .withColumn("chunk_idx", explode(sequence(lit(0), size(col("__cuts")))))
      .withColumn(
        "chunk_start",
        when(col("chunk_idx") === 0, lit(1))
          .otherwise(element_at(col("__cuts"), col("chunk_idx")) + 1))
      .withColumn(
        "__end",
        when(col("chunk_idx") === size(col("__cuts")), col("__n"))
          .otherwise(element_at(col("__cuts"), col("chunk_idx") + 1)))
      .withColumn("chunk_len", col("__end") - col("chunk_start") + 1)
      .withColumn(
        "chunk_hash",
        SharedHash.md5Long60(col("__t").substr(col("chunk_start"), col("chunk_len"))))
      .select(
        col(idCol), col("chunk_idx"), col("chunk_start"), col("chunk_len"), col("chunk_hash"))
  }

  /** The distinct chunk-hash index of a static corpus — the serve-side
    * state for [[graft.streaming.DocStream.cdcGateStream]]. One column
    * `chunk_hash`; corpus-sized, so it stream-static JOINS (never
    * broadcasts).
    */
  def hashIndex(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame =
    chunks(corpus, textCol, idCol, window, divisor).select(col("chunk_hash")).distinct()

  /** Persist a chunk-hash index — chunk the 100 TB corpus once, gate
    * any stream from any session. The hash set is CORPUS-sized, so it
    * is written as an ordinary distributed parquet dataset under `path`
    * and REFERENCED from a meta-only [[graft.sources.IndexCatalog]]
    * entry (the NgramLm/graph pattern — catalog parts proper are
    * reserved for driver-bounded state); `window`/`divisor` ride in
    * props because a serving session MUST chunk with the parameters the
    * index was built under or every lookup silently misses.
    */
  def saveIndex(
      spark: org.apache.spark.sql.SparkSession,
      index: DataFrame,
      path: String,
      window: Int,
      divisor: Int
  ): Unit = {
    index.write.mode("overwrite").parquet(s"$path/hashes")
    graft.sources.IndexCatalog.write(
      spark, path, "cdc_hash_index",
      Map(
        "window" -> window.toString,
        "divisor" -> divisor.toString,
        "hashes" -> "hashes"),
      Seq.empty)
  }

  /** Open a persisted chunk-hash index: (hash frame, window, divisor).
    * Serving code must chunk with the RETURNED params, not its own.
    */
  def loadIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): (DataFrame, Int, Int) = {
    val meta = graft.sources.IndexCatalog.open(spark, path, "cdc_hash_index")
    (
      spark.read.parquet(s"$path/${meta.prop("hashes")}"),
      meta.prop("window").toInt,
      meta.prop("divisor").toInt)
  }

  /** Sub-document dedup: drop every repeated chunk except its FIRST
    * occurrence corpus-wide (lowest (id, chunk_idx) owning the hash —
    * within-doc repeats collapse too) and rebuild each document from
    * its surviving chunks. The chunk-granular complement of
    * [[Survivors]]' whole-doc keep-best: templated boilerplate is cut
    * out of every later document while their unique content survives.
    *
    * Scale shape: chunk TEXT never shuffles — the keeper election and
    * keep-flag join move only (hash, id, idx, offset) tuples; the
    * surviving offsets aggregate to one bounded array per document and
    * join back to the original text, where `clean_text` is rebuilt
    * ROW-LOCALLY by slicing the document at the kept offsets.
    */
  def removeDupChunks(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame = {
    val ch = chunks(docs, textCol, idCol, window, divisor)
    val keeper = ch
      .groupBy(col("chunk_hash"))
      .agg(min(struct(col(idCol), col("chunk_idx"))).as("__k"))
    val kept = ch
      .join(keeper, Seq("chunk_hash"))
      .where(struct(col(idCol), col("chunk_idx")) === col("__k"))
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(
          col("chunk_idx").as("i"), col("chunk_start").as("s"), col("chunk_len").as("l"))))
          .as("__kept"),
        count(lit(1)).as("n_kept"),
        sum(col("chunk_len").cast("long")).as("__kc"))
    docs
      .select(col(idCol), col(textCol).as("__t"), length(col(textCol)).as("__n"))
      .where(col("__n") >= 1)
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(
          array_join(transform(col("__kept"), o => col("__t").substr(o("s"), o("l"))), ""),
          lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n").cast("long") - coalesce(col("__kc"), lit(0L))).as("removed_chars"))
  }

  /** Per-document chunk-dedup stats: (idCol, n_chunks, n_dup_chunks,
    * dup_chars), where a chunk is "dup" when its hash occurs in at
    * least one OTHER document (within-doc repeats alone don't count).
    * dup_chars / length is the document's boilerplate share.
    */
  def dedupStats(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      window: Int = 8,
      divisor: Int = 32
  ): DataFrame =
    statsOf(chunks(docs, textCol, idCol, window, divisor), idCol)

  /** [[chunks]] via the [[graft.functions.GearChunks]] kernel — same
    * output shape (BYTE offsets, 0-based start; FNV fingerprints), one
    * table lookup per byte instead of one md5 per window position, plus
    * the min/max chunk bounds the relational form cannot express. The
    * 100 TB path; the md5 form stays the cross-engine-oracle pin.
    */
  def chunksGear(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minLen: Int = 16,
      maxLen: Int = 256,
      maskBits: Int = 5
  ): DataFrame =
    docs
      .select(
        col(idCol),
        posexplode(
          graft.functions.GearChunks.gearChunks(col(textCol), minLen, maxLen, maskBits))
          .as(Seq("chunk_idx", "__c")))
      .select(
        col(idCol), col("chunk_idx"), col("__c.start").as("chunk_start"),
        col("__c.len").as("chunk_len"), col("__c.hash").as("chunk_hash"))

  /** [[dedupStats]] over the gear kernel (rows+spec: FNV/gear are not
    * SQL-replayable; the md5 twin q99 pins the stats semantics).
    */
  def dedupStatsGear(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minLen: Int = 16,
      maxLen: Int = 256,
      maskBits: Int = 5
  ): DataFrame =
    statsOf(chunksGear(docs, textCol, idCol, minLen, maxLen, maskBits), idCol)

  private def statsOf(ch: DataFrame, idCol: String): DataFrame = {
    val occ = ch.groupBy(col("chunk_hash")).agg(countDistinct(col(idCol)).as("__nd"))
    ch.join(occ, Seq("chunk_hash"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__nd") > 1, col("chunk_len").cast("long")).otherwise(0L)).as("dup_chars"))
  }
}
