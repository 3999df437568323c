package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-substring (shared-span) duplication audit, after Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (2021):
  * two documents sharing any exact n-token span are near-duplicates /
  * cross-contaminated even when their overall Jaccard is low — the
  * failure mode MinHash misses. Per document:
  *
  *   - `n_spans`   distinct n-token spans (docs shorter than n
  *                 contribute their whole text as one span)
  *   - `n_shared`  spans that also occur in ≥1 other document
  *   - `n_foreign` spans whose canonical owner (min doc id over the
  *                 span) is another document — `n_foreign > 0` is the
  *                 deterministic "drop this doc, keep the earliest"
  *                 dedup rule
  *
  * Shape: the span inventory reuses [[MinHashLsh.shingleHashes]]
  * (posexplode + window `lead`, xxhash64 per span — the shuffle carries
  * 8-byte hashes, never span text); then groupBy(hash) for ownership
  * and one hash-co-partitioned join back (the groupBy output is already
  * partitioned on the join key, so AQE plans no extra exchange). The
  * suffix-array machinery of the paper is a single-machine construct;
  * hash-grouped spans are the shuffle-native equivalent for partial
  * (span-level) dedup at corpus scale.
  */
object SpanDedup {

  def spanStats(df: DataFrame, textCol: String, idCol: String, n: Int = 8): DataFrame = {
    // the shingling pipeline is the dominant cost and feeds BOTH sides
    // of the ownership join — persist so it runs once, checkpoint the
    // (small) per-doc result, release the span frame (MinHashLsh
    // pattern: compute once, truncate lineage, unpersist upstream)
    val grams = MinHashLsh.shingleHashes(df, textCol, idCol, n).persist() // (id, sh) distinct
    val owners = grams
      .groupBy(col("sh"))
      .agg(min(col(idCol)).as("owner"), count(lit(1)).as("ndocs"))
    val out = grams
      .join(owners, Seq("sh"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1).otherwise(0)).as("n_shared"),
        sum(when(col("owner") < col(idCol), 1).otherwise(0)).as("n_foreign"))
      .localCheckpoint()
    grams.unpersist(false)
    out
  }

  /** Survivor filter: keep documents owning all their spans (every span
    * first seen here). The "keep earliest, drop later duplicates" rule.
    */
  def survivors(df: DataFrame, textCol: String, idCol: String, n: Int = 8): DataFrame =
    df.join(
      spanStats(df, textCol, idCol, n).where(col("n_foreign") === 0).select(col(idCol)),
      Seq(idCol))

  /** Benchmark decontamination: per corpus document, how many of its
    * n-token spans appear ANYWHERE in `probe` (the eval/benchmark set).
    * `n_hits > 0` means the doc leaks eval content and must be dropped
    * before training. Shape: the probe's distinct span hashes are tiny
    * relative to the corpus (eval sets are small BY DEFINITION), so the
    * semi-match is a broadcast hash join against the corpus span stream
    * — the corpus is scanned once and never shuffled on span text.
    */
  def contamination(
      corpus: DataFrame,
      probe: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8
  ): DataFrame = {
    val corpusGrams = MinHashLsh.shingleHashes(corpus, textCol, idCol, n)
    val probeGrams = broadcast(
      MinHashLsh.shingleHashes(probe, textCol, idCol, n).select(col("sh")).distinct())
    corpusGrams
      .join(probeGrams.withColumn("hit", lit(1)), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
  }

  /** [[contamination]] for probe sets too big to broadcast as rows — a
    * billion-span historical index, not a benchmark suite. The standard
    * Bloom trick: the probe's distinct span hashes fold into a
    * fixed-size bit array (≈1.2 GB per 10⁹ spans at 1% fpp, vs tens of
    * GB of hash rows), broadcast once; the corpus span stream is
    * prefiltered ROW-LOCALLY, so only the ~fpp false-positive fraction
    * plus the true hits ever enters the exact semi-join that removes
    * the false positives. Output is IDENTICAL to [[contamination]] —
    * the Bloom filter only prunes, the exact join decides (pinned by
    * DedupSpec).
    */
  def contaminationBloom(
      corpus: DataFrame,
      probe: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 8,
      fpp: Double = 0.01
  ): DataFrame = {
    val probeGrams = MinHashLsh.shingleHashes(probe, textCol, idCol, n)
      .select(col("sh")).distinct().persist()
    val expected = math.max(probeGrams.count(), 1L)
    val bf = probeGrams.stat.bloomFilter("sh", expected, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    val corpusGrams = MinHashLsh.shingleHashes(corpus, textCol, idCol, n).persist()
    val might = udf((h: Long) => bc.value.mightContainLong(h))
    val hits = corpusGrams
      .where(might(col("sh"))) // row-local prune: no shuffle, no join yet
      .join(probeGrams, Seq("sh"), "left_semi") // exact: kills bloom FPs
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__hits"))
    val out = corpusGrams
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"), coalesce(col("__hits"), lit(0L)).as("n_hits"))
      .localCheckpoint()
    corpusGrams.unpersist(false)
    probeGrams.unpersist(false)
    out
  }
}
