package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted near-duplicate detection (SURVEY.md §2 P2b): [[MinHashLsh]]
  * treats documents as shingle SETS, so a document that repeats one
  * paragraph 50 times and one that contains it once look identical.
  * Here each shingle carries its term frequency and signatures come from
  * ICWS ([[graft.functions.IcwsMinHashAgg]]), whose lane-collision
  * probability is the GENERALIZED Jaccard Σmin(wA,wB)/Σmax(wA,wB) — the
  * weight-aware similarity the boilerplate/template-heavy web corpora
  * actually need.
  *
  * Pipeline shape is identical to [[MinHashLsh]] (same banding, same
  * (band, bucket) self-join — candidates shuffle, never all pairs), and
  * the exact verify stage is pure join algebra: Σmin over shared
  * shingles via an equi-join restricted to candidate pairs, and
  * Σmax = W_a + W_b − Σmin from per-doc weight totals — no per-pair set
  * materialization at all, so the verify is itself shuffle-bounded by
  * candidates × shared tokens.
  */
object WeightedMinHash {

  /** (id, sh, w) — one row per distinct shingle hash per document, with
    * w = the shingle's term frequency. Delegates to
    * [[MinHashLsh.shingleWeights]] — ONE shingling implementation for
    * both the set and the weighted pipelines.
    */
  def tokenWeights(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      gramHash: Column => Column = xxhash64(_)
  ): DataFrame =
    MinHashLsh.shingleWeights(df, textCol, idCol, n, gramHash)

  /** (id, sig array<long>) — ICWS signatures from an (id, sh, w) frame. */
  def signaturesFromWeighted(
      wsh: DataFrame,
      idCol: String,
      numHashes: Int = 64,
      seed: Long = 42L
  ): DataFrame =
    wsh
      .groupBy(col(idCol))
      .agg(graft.functions.IcwsMinHashAgg.icws(col("sh"), col("w"), numHashes, seed).as("sig"))

  /** (id, sig) — tf-weighted ICWS signatures straight from text. */
  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      seed: Long = 42L
  ): DataFrame =
    signaturesFromWeighted(tokenWeights(df, textCol, idCol, shingleSize), idCol, numHashes, seed)

  /** Same-bucket candidate pairs (id_a < id_b) via [[MinHashLsh.bands]]
    * banding over ICWS signatures — eager, caches released (the
    * [[MinHashLsh.candidatePairs]] pattern).
    */
  def candidatePairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val sig = signatures(df, textCol, idCol, numHashes, shingleSize, seed)
    val b = MinHashLsh.bands(sig, idCol, numBands, numHashes).persist()
    val out = MinHashLsh.pairsFromBands(b, idCol).localCheckpoint()
    b.unpersist(false)
    out
  }

  /** Candidates verified with EXACT generalized Jaccard ≥ threshold.
    *
    * The weighted-shingle pipeline runs ONCE (persisted (id, sh, w)
    * frame feeds signatures, totals, and the verify join). Verification:
    *   Σmin(wa, wb) — equi-join of the candidates' token rows on sh
    *   Σmax         — W_a + W_b − Σmin (per-doc totals, broadcast-sized)
    * Candidate pairs sharing no token drop out of the inner join — their
    * generalized Jaccard is 0, below any positive threshold.
    */
  def nearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double,
      numHashes: Int = 64,
      shingleSize: Int = 3,
      numBands: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    require(threshold > 0.0, "threshold must be positive (0 would need outer-join semantics)")
    val wsh = tokenWeights(df, textCol, idCol, shingleSize).persist()
    val sig = signaturesFromWeighted(wsh, idCol, numHashes, seed)
    val b = MinHashLsh.bands(sig, idCol, numBands, numHashes).persist()
    val cands = MinHashLsh.pairsFromBands(b, idCol)
    val totals = wsh.groupBy(col(idCol)).agg(sum(col("w")).as("tw"))
    val shared = cands
      .join(wsh.select(col(idCol).as("id_a"), col("sh"), col("w").as("wa")), Seq("id_a"))
      .join(wsh.select(col(idCol).as("id_b"), col("sh"), col("w").as("wb")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("wa"), col("wb"))).as("imin"))
    val verified = shared
      .join(totals.select(col(idCol).as("id_a"), col("tw").as("twa")), Seq("id_a"))
      .join(totals.select(col(idCol).as("id_b"), col("tw").as("twb")), Seq("id_b"))
      .withColumn(
        "jaccard_w",
        round(col("imin") / (col("twa") + col("twb") - col("imin")), 4))
      .where(col("jaccard_w") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard_w"))
    val out = verified.localCheckpoint()
    Seq(wsh, b).foreach(_.unpersist(false))
    out
  }
}
