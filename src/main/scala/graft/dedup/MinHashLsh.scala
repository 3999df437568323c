package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection (SURVEY.md §2 P2).
  *
  * Pipeline (all declarative, shuffle only on small derived keys):
  *  1. shingle: word n-grams per document (`sequence` + `transform` —
  *     array algebra inside codegen);
  *  2. hash shingles with xxhash64 and explode → (doc, shingleHash);
  *  3. minhash signature: for each of `numHashes` seeded affine
  *     permutations h_i(x) = (a_i·x + b_i) mod p, take min over the
  *     document's shingles — ONE groupBy(doc) with `numHashes` min
  *     aggregates (map-side combined);
  *  4. band: split the signature into `bands` bands of `rowsPerBand`,
  *     hash each band, explode → (band, bucket, doc);
  *  5. candidate pairs: self-join on (band, bucket) with id< id —
  *     only same-bucket docs ever meet, never all pairs;
  *  6. verify: exact shingle-set Jaccard on candidates only.
  *
  * Determinism: the permutation constants come from a fixed seed, so
  * results are reproducible across runs and cluster sizes.
  */
object MinHashLsh {
  /** 2^31-1: shingle hashes and permutation constants live in this field
    * so a*h + b stays < 2^62 — no silent Long overflow inside the plan.
    */
  private val MersennePrime = 2147483647L

  /** Seeded affine permutation constants (deterministic). */
  def coefficients(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
                         math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array
    * column. Higher-order functions run interpreted: if the tokens were
    * an inline `split(...)` expression it would re-evaluate once per
    * shingle (O(tokens²) per document) — callers must bind tokens to a
    * real column first (see [[shingled]]).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))
        )
      )

  /** (id, sh) — one row per DISTINCT word-n-gram hash of each document.
    *
    * Deliberately row-based, not array-lambda-based: higher-order
    * functions evaluate interpreted, and Catalyst's CollapseProject
    * inlines a bound token-array alias back into the lambda so the
    * `split` re-runs for every shingle (O(tokens²) per document, pinned
    * to the scan's partitioning). Here `split` runs ONCE per document
    * inside a Generate, n-grams assemble from codegen'd `lead` windows
    * after a shuffle on the id — which also parallelizes the work and is
    * the exact partitioning the downstream minhash groupBy(id) reuses.
    * Hashes are longs (xxhash64): set algebra on longs beats strings and
    * collisions are negligible at corpus scale.
    *
    * Documents with fewer than n tokens contribute their whole text as a
    * single shingle (same convention as [[shinglesFromTokens]]).
    *
    * `gramHash` defaults to xxhash64 (codegen'd, the production choice);
    * the oracle-checked q21 passes [[graft.functions.SharedHash
    * .md5Long60]] so DuckDB can replay the identical signatures.
    */
  def shingleHashes(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame =
    shingleWeights(df, textCol, idCol, n, gramHash).select(col(idCol), col("sh"))

  /** (id, sh, w) — distinct shingle hashes WITH their term frequency.
    * The single source of shingling truth: [[shingleHashes]] is this
    * minus the weight, [[WeightedMinHash]] consumes the weights —
    * a convention change (tokenization, the short-doc whole-text hash)
    * lands in one place.
    */
  def shingleWeights(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val withLeads = (1 until n).foldLeft(toks) { (acc, k) =>
      acc.withColumn(s"__t$k", lead(col("tok"), k).over(w))
    }
    val parts = col("tok") +: (1 until n).map(k => col(s"__t$k"))
    val grams = withLeads
      .where(parts.map(_.isNotNull).reduce(_ && _))
      .select(col(idCol), gramHash(concat_ws(" ", parts: _*)).as("sh"))
    val shortDocs = df
      .where(size(split(col(textCol), " ")) < n)
      .select(col(idCol), gramHash(col(textCol)).as("sh"))
    grams
      .union(shortDocs)
      .groupBy(col(idCol), col("sh"))
      .agg(count(lit(1)).cast("double").as("w"))
  }

  /** (id, sh_set array<long>) — distinct shingle-hash set per document,
    * SORTED so pairwise intersection is a codegen'd merge walk
    * ([[graft.functions.SetOps.sortedIntersectSize]]), not a hash set
    * allocated per pair.
    */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    setsFromShingles(shingleHashes(df, textCol, idCol, n), idCol)

  /** [[shingleSets]] from an already-computed (id, sh) frame. */
  def setsFromShingles(sh: DataFrame, idCol: String): DataFrame =
    sh.groupBy(col(idCol)).agg(sort_array(collect_set(col("sh"))).as("sh_set"))

  /** Word n-gram shingles of `text` as an array column (small-input
    * convenience; prefer [[shingled]] in plans).
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(split(text, " "), n)

  /** (id, sig array<long>) — minhash signatures. */
  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      seed: Long = 42L
  ): DataFrame =
    signaturesFromShingles(shingleHashes(df, textCol, idCol, shingleSize), idCol, numHashes, seed)

  /** [[signatures]] from an already-computed (id, sh) frame — lets
    * callers that also need shingle SETS (the verify stage) run the
    * expensive shingling pipeline exactly once.
    */
  def signaturesFromShingles(
      sh: DataFrame,
      idCol: String,
      numHashes: Int = 64,
      seed: Long = 42L
  ): DataFrame = {
    val coefs = coefficients(numHashes, seed)
    // one custom TypedImperativeAggregate computes all lanes in a single
    // buffer — numHashes separate min() aggregates generate pathological
    // amounts of Janino code (see graft.functions.MinHashAgg)
    sh.withColumn("h", pmod(col("sh"), lit(MersennePrime)))
      .groupBy(col(idCol))
      .agg(
        graft.functions.MinHashAgg
          .minhash(col("h"), coefs.map(_._1), coefs.map(_._2), MersennePrime)
          .as("sig")
      )
  }

  /** (band, bucket, id) — banded signature buckets. `sigLen` must be the
    * signature length (passing it avoids a driver action on the frame —
    * a `.head()` here would evaluate the whole minhash pipeline as a
    * single-task limit job).
    */
  def bands(sig: DataFrame, idCol: String, numBands: Int, sigLen: Int): DataFrame = {
    val rowsPerBand = sigLen / numBands
    val bandCols = (0 until numBands).map { b =>
      struct(lit(b).as("band"), xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
    }
    sig
      .select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Generous default hot-bucket cap: a (band, bucket) with 2,000
    * members still emits ~2M candidate pairs — large but bounded. At
    * sf0.1 no bucket comes near it (oracles unaffected); on a
    * boilerplate-heavy web corpus it is the difference between a
    * bounded job and an m²/2 blow-up on one degenerate bucket.
    */
  val DefaultMaxBucket = 2000

  /** Two-pass hot-bucket cap over any (keyed) frame: pass 1 aggregates
    * bucket sizes (map-side combined; output is buckets-sized) and keeps
    * only the HOT keys (> maxBucket members) — by assumption a rare,
    * small set (degenerate boilerplate buckets), broadcast to the second
    * pass. Pass 2 left-joins the flag: rows in cold buckets pass through
    * UNSORTED (no window, no sort — the overwhelmingly common path);
    * rows in hot buckets alone are ranked by `order` and capped at
    * `maxBucket`. Kept-set semantics are IDENTICAL to ranking every
    * bucket — cold buckets keep all members either way — but the cost is
    * aggregate + broadcast-semi-join + a sort of only the degenerate
    * slice, not a corpus×bands-sized sort (the r11 regression: the
    * unconditional window doubled the MinHash bench family).
    *
    * `frame` is scanned twice (sizes, then pass-through) — callers
    * persist it (all current ones do).
    */
  private[graft] def capBuckets(
      frame: DataFrame,
      keyCols: Seq[String],
      order: Seq[Column],
      maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val hot = frame
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("__sz"))
      .where(col("__sz") > maxBucket)
      .select(keys :+ lit(true).as("__hot"): _*)
    val flagged = frame.join(broadcast(hot), keyCols, "left")
    val cold = flagged.where(col("__hot").isNull).drop("__hot")
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    val hotCapped = flagged
      .where(col("__hot"))
      .drop("__hot")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= maxBucket)
      .drop("__rk")
    cold.unionByName(hotCapped)
  }

  /** Same-bucket candidate pairs (id_a < id_b) from a banded frame.
    *
    * HOT-BUCKET CAP: a degenerate (band, bucket) with m members would
    * emit m(m−1)/2 pairs from the self-join — quadratic in the bucket
    * size, and real web corpora HAVE such buckets (boilerplate pages,
    * empty-ish documents sharing a band slice). Buckets above
    * `maxBucket` are therefore hash-sampled down to `maxBucket` members
    * (deterministic: the members with the smallest (xxhash64(id), id) —
    * the same sample in every band, so the kept members of a degenerate
    * duplicate class still pair with EACH OTHER and collapse into one
    * connected component). Cap cost is pay-per-hot-bucket via
    * [[capBuckets]]: cold buckets are never sorted.
    *
    * WHAT THE CAP DROPS: dropped members appear in no candidate pair.
    * For BYTE-IDENTICAL degenerate docs the standard exact-dedup-first
    * pass recovers them; for near-identical-but-not-byte-identical
    * classes larger than `maxBucket` the dropped members silently lose
    * near-dup coverage — callers trusting full recall must check
    * [[hotBuckets]] (per-bucket dropped-member / dropped-pair counts;
    * empty ⇔ the cap never bound).
    */
  private[dedup] def pairsFromBands(
      b: DataFrame,
      idCol: String,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(maxBucket >= 2, "MinHashLsh: maxBucket must be >= 2")
    val capped = capBuckets(
      b, Seq("band", "bucket"), Seq(xxhash64(col(idCol)), col(idCol)), maxBucket)
    val l = capped.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = capped.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Hot-bucket telemetry for the [[pairsFromBands]] cap: one row per
    * (band, bucket) whose size exceeds `maxBucket`, with the member
    * count, the kept count, and the dropped PAIR count
    * m(m−1)/2 − cap(cap−1)/2 — the exact candidate-generation loss the
    * cap traded for boundedness. Empty ⇔ the cap did not bind. One
    * groupBy over the banded frame; the result is hot-bucket-sized.
    */
  def hotBuckets(b: DataFrame, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val m = col("sz").cast("double")
    val c = least(col("sz"), lit(maxBucket.toLong)).cast("double")
    b.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("sz"))
      .where(col("sz") > maxBucket)
      .select(
        col("band"), col("bucket"), col("sz"),
        least(col("sz"), lit(maxBucket.toLong)).as("kept"),
        ((m * (m - 1) - c * (c - 1)) / 2).cast("long").as("dropped_pairs"))
  }

  /** Candidate near-duplicate pairs (id_a < id_b), deduplicated.
    *
    * EAGER: the (small) pair set is materialized before returning so the
    * banded intermediate — read by both sides of the self-join — can be
    * cached for exactly the duration of the computation and released
    * (round-1 review: persist()s that outlive the query accumulate in
    * the block manager across a long session).
    */
  def candidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHash: Column => Column = xxhash64(_),
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val sh = shingleHashes(df, textCol, idCol, shingleSize, gramHash)
    val sig = signaturesFromShingles(sh, idCol, numHashes, seed)
    val b = bands(sig, idCol, numBands, numHashes).persist()
    val out = pairsFromBands(b, idCol, maxBucket).localCheckpoint()
    b.unpersist(false)
    out
  }

  /** Candidates verified with exact shingle-set Jaccard ≥ threshold.
    *
    * The shingling pipeline (posexplode + window leads — the measured
    * dominant cost) runs ONCE: the persisted (id, sh) frame feeds both
    * the minhash signatures and the exact verify sets. The (small) pair
    * result is materialized eagerly so every intermediate cache is
    * released before returning.
    */
  def nearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHash: Column => Column = xxhash64(_),
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    val sh = shingleHashes(df, textCol, idCol, shingleSize, gramHash).persist()
    val sig = signaturesFromShingles(sh, idCol, numHashes, seed)
    val b = bands(sig, idCol, numBands, numHashes).persist()
    val cands = pairsFromBands(b, idCol, maxBucket)
    // persist: joined twice (id_a side and id_b side)
    val sets = setsFromShingles(sh, idCol).persist()
    val verified = cands
      .join(sets.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh_set", "set_a"), Seq("id_a"))
      .join(sets.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh_set", "set_b"), Seq("id_b"))
      .withColumn(
        "inter",
        graft.functions.SetOps.sortedIntersectSize(col("set_a"), col("set_b")).cast("double"))
      .withColumn(
        "jaccard",
        round(col("inter") / (size(col("set_a")) + size(col("set_b")) - col("inter")), 4)
      )
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val out = verified.localCheckpoint()
    Seq(sh, b, sets).foreach(_.unpersist(false))
    out
  }

  /** Threshold-sweep telemetry: the verified-Jaccard HISTOGRAM of all
    * LSH candidate pairs, plus the cumulative pair count at each bin
    * floor — the tuning artifact behind "what does 0.5 vs 0.7 actually
    * drop on THIS corpus". One extra aggregate over the pairs
    * [[nearDuplicates]] already verifies (threshold 0 keeps them all);
    * the histogram is bins-sized, so the cumulative window is driver-
    * trivial.
    */
  def thresholdSweep(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bins: Int = 10,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    import org.apache.spark.sql.expressions.Window
    nearDuplicates(df, textCol, idCol, threshold = 0.0,
      numHashes, shingleSize, numBands, seed, gramHash)
      .withColumn(
        "bin",
        least(floor(col("jaccard") * bins), lit(bins - 1L)).cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("lo", round(col("bin").cast("double") / bins, 4))
      .withColumn("hi", round((col("bin") + 1).cast("double") / bins, 4))
      .withColumn(
        "n_pairs_ge_lo",
        sum(col("n_pairs")).over(Window.orderBy(col("bin").desc)))
      .select("bin", "lo", "hi", "n_pairs", "n_pairs_ge_lo")
  }

  // ---- persisted corpus index (P2c): build / save / load / append ------

  /** Serving-shaped corpus index: one row per (band, bucket) membership
    * carrying the member's full signature and exact verify set — the
    * frame every against-corpus consumer (batch
    * [[dedupeAgainstIndex]], streaming
    * [[graft.streaming.DocStream.nearDupAgainstCorpus]]) joins on
    * (band, bucket). Corpus-sized by design: it is written as a
    * referenced parquet dataset, never broadcast.
    *
    * HOT-BUCKET CAP at BUILD time (the [[pairsFromBands]] contract's
    * serving sibling): a degenerate corpus bucket with m members would
    * make every matching batch row fan out m-fold AT EVERY SERVE — the
    * quadratic moves from the build to the query path. Buckets keep
    * their `maxBucket` smallest-(xxhash64(id), id) members; a batch
    * document near-duplicating the degenerate class still collides
    * with the kept members (they are the same class), so dedup recall
    * on the CLASS is intact — what is lost is per-member attribution
    * beyond the cap, the documented trade.
    */
  def corpusIndex(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHash: Column => Column = xxhash64(_),
      maxBucket: Int = DefaultMaxBucket
  ): DataFrame = {
    require(maxBucket >= 1, "MinHashLsh.corpusIndex: maxBucket must be >= 1")
    val sh = shingleHashes(corpus, textCol, idCol, shingleSize, gramHash)
    val sig = signaturesFromShingles(sh, idCol, numHashes, seed)
    capBuckets(
      bands(sig, idCol, numBands, numHashes),
      Seq("band", "bucket"), Seq(xxhash64(col(idCol)), col(idCol)), maxBucket)
      .join(
        sig.select(col(idCol).as("corpus_id"), col("sig").as("corpus_sig")),
        col(idCol) === col("corpus_id"))
      .join(
        setsFromShingles(sh, idCol)
          .select(col(idCol).as("__sid"), col("sh_set").as("corpus_set")),
        col("corpus_id") === col("__sid"))
      .select(col("band"), col("bucket"), col("corpus_id"), col("corpus_sig"), col("corpus_set"))
  }

  val IndexKind = "minhash_index"

  /** A loaded corpus index: the banded frame plus the parameters every
    * serve-side computation MUST share with the build (a signature
    * computed under different constants never matches — the params
    * travel in the catalog entry, the CDC-index lesson).
    * `gramHashName` ∈ {xxhash64, md5_60}.
    */
  final case class Index(
      numHashes: Int,
      shingleSize: Int,
      numBands: Int,
      seed: Long,
      gramHashName: String,
      bands: DataFrame,
      maxBucket: Int = DefaultMaxBucket
  ) {
    def gramHashFn: Column => Column = Index.hashFn(gramHashName)
  }

  object Index {
    def hashFn(name: String): Column => Column = name match {
      case "xxhash64" => xxhash64(_)
      case "md5_60" => graft.functions.SharedHash.md5Long60
      case other => sys.error(s"minhash_index: unknown gram_hash '$other'")
    }
  }

  /** Build and persist the corpus index as an [[graft.sources.IndexCatalog]]
    * entry: the corpus-sized banded frame is a REFERENCED parquet
    * dataset (`bands/`), the meta entry carries every build parameter.
    */
  def saveIndex(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      path: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L,
      gramHashName: String = "xxhash64",
      maxBucket: Int = DefaultMaxBucket
  ): Unit = {
    val spark = corpus.sparkSession
    corpusIndex(corpus, textCol, idCol, numHashes, shingleSize, numBands, seed,
      Index.hashFn(gramHashName), maxBucket)
      .write.mode("overwrite").parquet(s"$path/bands")
    graft.sources.IndexCatalog.write(
      spark, path, IndexKind,
      Map(
        "num_hashes" -> numHashes.toString,
        "shingle_size" -> shingleSize.toString,
        "num_bands" -> numBands.toString,
        "seed" -> seed.toString,
        "gram_hash" -> gramHashName,
        "max_bucket" -> maxBucket.toString,
        "bands" -> "bands"),
      Seq.empty)
  }

  def loadIndex(spark: org.apache.spark.sql.SparkSession, path: String): Index = {
    val meta = graft.sources.IndexCatalog.open(spark, path, IndexKind)
    Index(
      meta.propInt("num_hashes"),
      meta.propInt("shingle_size"),
      meta.propInt("num_bands"),
      meta.prop("seed").toLong,
      meta.prop("gram_hash"),
      spark.read.parquet(s"$path/${meta.prop("bands")}"),
      // pre-r11 entries carry no cap; the default applies on append
      scala.util.Try(meta.propInt("max_bucket")).getOrElse(DefaultMaxBucket))
  }

  /** Append new documents to a persisted index under the SAME build
    * parameters (read back from the entry — the caller cannot get them
    * wrong). Existing rows are untouched; the daily-crawl flow is
    * dedupe-the-batch → append-the-survivors.
    *
    * GLOBAL CAP ON APPEND: the hot-bucket cap holds across appends, not
    * just within each batch — repeated daily appends of a degenerate
    * class must not regrow a (band, bucket) past `maxBucket`, or the
    * per-serve m-fold fan-out the build-time cap bounds comes back.
    * Append-only storage cannot replay the build's global
    * smallest-(xxhash64(id), id) rule without rewriting old files, so
    * the append policy is FIRST-EPOCH PRIORITY: existing members are
    * never evicted; each batch admits into a bucket only up to its
    * remaining quota (maxBucket − existing), choosing the batch's
    * smallest-(xxhash64(id), id) members — deterministic given the
    * append order. Cost is pay-per-overflowing-bucket: one aggregate
    * over the existing index (bucket-count-sized output), one over the
    * batch, a broadcast of the (tiny) overflowing set; non-overflowing
    * batch rows append unsorted.
    *
    * Returns hotBuckets-style telemetry: one row per bucket where the
    * quota bound — (band, bucket, existing, incoming, admitted,
    * dropped). Empty ⇔ every batch row was admitted.
    */
  def appendIndex(newDocs: DataFrame, textCol: String, idCol: String, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = newDocs.sparkSession
    val idx = loadIndex(spark, path)
    val newRows = corpusIndex(newDocs, textCol, idCol, idx.numHashes, idx.shingleSize,
      idx.numBands, idx.seed, idx.gramHashFn, idx.maxBucket).persist()
    val newCounts = newRows.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("__nn"))
    val existCounts = idx.bands.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("__ne"))
    // overflowing buckets only — tiny by the hot-bucket assumption;
    // materialized eagerly (it feeds both the admit join and the
    // telemetry return, and must be read before the append lands)
    val quota = newCounts
      .join(existCounts, Seq("band", "bucket"), "left")
      .withColumn("__ne", coalesce(col("__ne"), lit(0L)))
      .where(col("__nn") + col("__ne") > idx.maxBucket)
      .select(
        col("band"), col("bucket"), col("__ne").as("existing"), col("__nn").as("incoming"),
        greatest(lit(0L), lit(idx.maxBucket.toLong) - col("__ne")).as("__quota"))
      .localCheckpoint()
    val flagged = newRows.join(
      broadcast(quota.select(col("band"), col("bucket"), col("__quota"))),
      Seq("band", "bucket"), "left")
    val pass = flagged.where(col("__quota").isNull).drop("__quota")
    val w = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(xxhash64(col("corpus_id")), col("corpus_id"))
    val ranked = flagged
      .where(col("__quota").isNotNull)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= col("__quota"))
      .drop("__rk", "__quota")
    pass.unionByName(ranked).write.mode("append").parquet(s"$path/bands")
    newRows.unpersist(false)
    quota
      .withColumn("admitted", least(col("incoming"), col("__quota")))
      .withColumn("dropped", col("incoming") - col("admitted"))
      .select("band", "bucket", "existing", "incoming", "admitted", "dropped")
  }

  /** Fuzzy-dedupe a NEW batch against a prebuilt index: band join for
    * candidates, exact shingle-set Jaccard verify, no corpus pass.
    * Scale shape: the new batch's bands join the index on (band,
    * bucket); the candidate pair set is new-batch-bounded, so the
    * corpus verify sets are fetched by a candidate semi-join — the
    * corpus-sized index is scanned once and only candidate rows'
    * (fat) verify sets ever reach the pair join.
    */
  def dedupeAgainstIndex(
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      idx: Index,
      threshold: Double
  ): DataFrame = {
    val sh = shingleHashes(newDocs, textCol, idCol, idx.shingleSize, idx.gramHashFn).persist()
    val sig = signaturesFromShingles(sh, idCol, idx.numHashes, idx.seed)
    val b = bands(sig, idCol, idx.numBands, idx.numHashes)
    val pairs = b
      .join(idx.bands.select(col("band"), col("bucket"), col("corpus_id")), Seq("band", "bucket"))
      .where(col(idCol) =!= col("corpus_id"))
      .select(col(idCol), col("corpus_id"))
      .distinct()
      .persist()
    val corpusSets = idx.bands
      .join(pairs.select(col("corpus_id")).distinct(), Seq("corpus_id"), "left_semi")
      .select(col("corpus_id"), col("corpus_set"))
      .dropDuplicates("corpus_id")
    val verified = pairs
      .join(setsFromShingles(sh, idCol), Seq(idCol))
      .join(corpusSets, Seq("corpus_id"))
      .withColumn(
        "inter",
        graft.functions.SetOps.sortedIntersectSize(col("sh_set"), col("corpus_set")).cast("double"))
      .withColumn(
        "jaccard",
        round(
          col("inter") / (size(col("sh_set")) + size(col("corpus_set")) - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select(col(idCol), col("corpus_id"), col("jaccard"))
    val out = verified.localCheckpoint()
    Seq(sh, pairs).foreach(_.unpersist(false))
    out
  }
}
