package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Variable-length exact-substring dedup — the criterion Lee et al.
  * (2021) actually run: find every substring of length ≥ L tokens that
  * occurs more than once in the corpus (their §4: L = 50 BPE tokens via
  * a suffix array). [[SpanDedup]]'s fixed-n shingles approximate this;
  * here the threshold semantics are exact.
  *
  * The algorithmic observation that makes this distributable WITHOUT
  * the suffix array: a suffix array is needed to enumerate maximal
  * repeats of EVERY length, but with a minimum length L the criterion
  * "position p starts a repeated span of ≥ L tokens" is just equality
  * of length-L prefixes of suffixes — an equivalence class, not an
  * order. Equality classes come from prefix-doubling fingerprints
  * (Karp–Miller–Rosenberg 1972, the same doubling the sort-based
  * suffix-array construction uses, minus the sort):
  *
  *   h_1(p)  = hash(token_p)
  *   h_2m(p) = hash(h_m(p), h_m(p+m))      — one window `lead` per step
  *   fp_L(p) = (h_H(p), h_H(p + L − H)),   H = 2^⌊log₂L⌋
  *
  * Two in-document positions share fp_L iff their next L tokens match
  * (modulo 64-bit hash collisions — the [[MinHashLsh.shingleHashes]]
  * convention). Every maximal repeated span of length M ≥ L flags
  * exactly its M − L + 1 start positions, so the union of [p, p+L)
  * over flagged p is EXACTLY the token set covered by repeated spans,
  * and runs of consecutive flagged starts recover the maximal span
  * lengths — no LCP array needed.
  *
  * Scale shape: ⌈log₂L⌉ window passes over (id, pos, 8-byte hash) —
  * all on one (doc, pos) sort, ONE exchange — versus the O(n·L) text
  * blow-up of materializing L-grams; then one groupBy on the 16-byte
  * fingerprint and one co-partitioned join back (the SpanDedup
  * ownership shape); per-doc interval union is a window over flagged
  * starts only. Suffixes never cross documents by construction, which
  * is what concatenation sentinels enforce in the single-machine
  * algorithm.
  */
object RepeatedSpans {

  /** Flagged start positions: (id, pos, owner, ndocs) for every
    * position whose next `minLen` tokens occur elsewhere in the corpus
    * (possibly in the same document). `owner` is the minimum doc id
    * over all occurrences of the span — the keep-earliest canon.
    * Returns a checkpointed frame; the doubling chain runs exactly once
    * (the SpanDedup persist lifecycle).
    */
  def flaggedStarts(df: DataFrame, textCol: String, idCol: String, minLen: Int): DataFrame = {
    val (out, fp) = flaggedPlan(df, textCol, idCol, minLen)
    val result = out.localCheckpoint()
    fp.unpersist(false)
    result
  }

  /** The lazy plan + its persisted fingerprint intermediate — split out
    * so plan-shape specs assert on the REAL plan (the [[Packing]]
    * convention). `fp` feeds BOTH the ownership groupBy and the join
    * back; without the persist the ⌈log₂L⌉-window doubling chain would
    * execute twice.
    */
  private[graft] def flaggedPlan(
      df: DataFrame, textCol: String, idCol: String, minLen: Int): (DataFrame, DataFrame) = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    // largest power of two <= minLen
    val bigH = Integer.highestOneBit(minLen)

    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    var cur = df
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("h", xxhash64(col("tok")))
      .drop("tok")
    var m = 1
    while (m < bigH) {
      // h_{2m}(p) = hash(h_m(p), h_m(p+m)); null once the suffix is
      // shorter than 2m — candidates below always have length >= minLen
      // so nulls never reach a fingerprint
      cur = cur
        .withColumn("h2", lead(col("h"), m).over(w))
        .withColumn("h", when(col("h2").isNotNull, xxhash64(col("h"), col("h2"))))
        .drop("h2")
      m *= 2
    }
    val fp = cur
      .withColumn("hb", lead(col("h"), minLen - bigH).over(w))
      .where(col("h").isNotNull && col("hb").isNotNull)
      .persist()

    val groups = fp
      .groupBy(col("h"), col("hb"))
      .agg(min(col(idCol)).as("owner"), count(lit(1)).as("nocc"))
      .where(col("nocc") > 1)
    // co-partitioned on the fingerprint after the groupBy — no extra
    // exchange for the join back
    val out = fp.join(groups, Seq("h", "hb"))
      .select(col(idCol), col("pos"), col("owner"), col("nocc"))
    (out, fp)
  }

  /** Per-document audit: for spans of ≥ `minLen` tokens occurring more
    * than once in the corpus,
    *
    *   - `n_rep_starts`  positions starting such a span
    *   - `rep_tokens`    tokens covered by at least one such span
    *                     (exact interval union)
    *   - `max_rep_len`   UPPER BOUND on the longest repeated span: the
    *                     longest run of consecutive flagged starts plus
    *                     minLen − 1. When two DIFFERENT repeated
    *                     minLen-grams happen to start at adjacent
    *                     positions, their runs merge and the bound
    *                     exceeds any single span that actually repeats
    *                     (run continuity is not owner-verified); use it
    *                     as a filter ceiling, not an exact length
    *   - `n_foreign`     flagged starts whose span's earliest owner is
    *                     a DIFFERENT (smaller-id) document
    *
    * Documents with no repeated content report zeros.
    */
  def stats(df: DataFrame, textCol: String, idCol: String, minLen: Int = 50): DataFrame = {
    val flagged = flaggedStarts(df, textCol, idCol, minLen)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val perDoc = flagged
      // interval-union contribution: min(L, gap to next flagged start)
      .withColumn("gap", lead(col("pos"), 1).over(w) - col("pos"))
      .withColumn("cov", least(coalesce(col("gap"), lit(minLen)), lit(minLen)))
      // consecutive flagged starts (gap 1) belong to one maximal span:
      // run key = pos − row_number is constant within a run
      .withColumn("run", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("run"))
      .agg(
        count(lit(1)).as("run_starts"),
        sum(col("cov")).as("run_cov"),
        sum(when(col("owner") < col(idCol), 1L).otherwise(0L)).as("run_foreign"))
      .groupBy(col(idCol))
      .agg(
        sum(col("run_starts")).as("n_rep_starts"),
        sum(col("run_cov")).as("rep_tokens"),
        (max(col("run_starts")) + lit(minLen.toLong - 1)).as("max_rep_len"),
        sum(col("run_foreign")).as("n_foreign"))
    df.select(col(idCol)).distinct()
      .join(perDoc, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_rep_starts"), lit(0L)).as("n_rep_starts"),
        coalesce(col("rep_tokens"), lit(0L)).as("rep_tokens"),
        coalesce(col("max_rep_len"), lit(0L)).as("max_rep_len"),
        coalesce(col("n_foreign"), lit(0L)).as("n_foreign"))
  }

  /** Row-local form of the doubling fingerprints: the SAME hash chain
    * as [[flaggedPlan]] (h₁ = xxhash64(tok), h_{2m}(p) = xxhash64(h_m(p),
    * h_m(p+m)) — identical values, pinned by spec), computed INSIDE the
    * token array with `zip_with`/`slice` instead of window `lead`s, then
    * combined to one key per start (xxhash64(h, hb)) and sorted-distinct.
    * Shuffle-free and append-safe: this is the STREAMING side of the
    * variable-length criterion (one doc per row needs no window). Docs
    * shorter than `minLen` yield an empty array, matching [[stats]]'s
    * zero-span convention.
    */
  private[graft] def fingerprintKeys(textCol: org.apache.spark.sql.Column, minLen: Int)
      : org.apache.spark.sql.Column = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val bigH = Integer.highestOneBit(minLen)
    val toks = split(textCol, " ")
    var h: org.apache.spark.sql.Column = transform(toks, t => xxhash64(t))
    var m = 1
    while (m < bigH) {
      val mm = m
      val shifted = slice(h, lit(mm + 1), greatest(size(h) - mm, lit(0)))
      h = zip_with(h, shifted, (a, b) => when(a.isNotNull && b.isNotNull, xxhash64(a, b)))
      m *= 2
    }
    val sb = minLen - bigH
    val hb = slice(h, lit(sb + 1), greatest(size(h) - sb, lit(0)))
    val keys = zip_with(h, hb, (a, b) => when(a.isNotNull && b.isNotNull, xxhash64(a, b)))
    array_sort(array_distinct(filter(keys, k => k.isNotNull)))
  }

  /** Distinct span-start fingerprint keys of a (static) probe corpus —
    * the broadcastable index for streaming decontamination
    * ([[graft.streaming.DocStream.longSpanContaminationStream]]).
    */
  def probeFingerprints(df: DataFrame, textCol: String, minLen: Int): DataFrame =
    df.select(explode(fingerprintKeys(col(textCol), minLen)).as("fp")).distinct()

  /** Survivor filter, consistent with [[SpanDedup.survivors]]'s
    * keep-earliest rule: drop any document containing a ≥ `minLen`
    * span whose earliest occurrence is in another document. Internal
    * repetition (nocc > 1 but owner == self) does not evict.
    */
  def survivors(df: DataFrame, textCol: String, idCol: String, minLen: Int = 50): DataFrame =
    df.join(
      stats(df, textCol, idCol, minLen).where(col("n_foreign") === 0).select(col(idCol)),
      Seq(idCol))
}
