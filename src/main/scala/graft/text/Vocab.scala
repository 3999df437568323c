package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics: per-token term frequency (total
  * occurrences) and document frequency — the substrate for IDF tables,
  * stopword discovery, and frequency-based quality filters over a
  * training corpus.
  *
  * Shape: one explode + one groupBy(token) with a distinct-count
  * aggregate; the shuffle carries (token, doc_id) pairs once. At
  * extreme scale swap `count_distinct` for `approx_count_distinct` —
  * the exact form is the default because it is oracle-checkable.
  */
object Vocab {

  /** (token, term_freq, doc_freq) for every distinct token. */
  def vocab(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("term_freq"),
        count_distinct(col(idCol)).as("doc_freq"))

  /** Add smoothed IDF: ln((1 + nDocs) / (1 + doc_freq)) + 1 (the
    * scikit-learn convention). `nDocs` is caller-supplied — it is one
    * tiny count the caller usually already has.
    */
  def withIdf(vocabDf: DataFrame, nDocs: Long): DataFrame =
    vocabDf.withColumn(
      "idf",
      log((lit(1.0) + nDocs.toDouble) / (lit(1.0) + col("doc_freq"))) + 1.0)

  /** Top-k tokens by term frequency, deterministically tie-broken by
    * token text.
    */
  def top(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    vocab(df, textCol, idCol)
      .orderBy(col("term_freq").desc, col("token"))
      .limit(k)

  /** Chao1 unseen-vocabulary estimate per stratum — "how much
    * vocabulary has this corpus slice NOT shown us yet?", the
    * species-richness question behind "is more crawl worth it".
    * From the per-(stratum, token) frequency table: S_obs observed
    * types, f₁ singletons, f₂ doubletons; Chao1 = S + f₁(f₁−1)/(2(f₂+1))
    * (the bias-corrected form, defined even at f₂ = 0), plus the
    * Good–Turing coverage estimate C = 1 − f₁/N. Two hash aggregates
    * (token explosion → frequency table → stratum summary); the
    * shuffle carries (stratum, token) keys, output is stratum-sized.
    */
  def chao1(df: DataFrame, textCol: String, strataCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val freqs = df
      .select(col(strataCol).as("g"), explode(split(col(textCol), " ")).as("token"))
      .groupBy("g", "token")
      .agg(count(lit(1)).as("tf"))
    freqs
      .groupBy("g")
      .agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("s_obs"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("tf") === 2, 1L).otherwise(0L)).as("f2"))
      .select(
        col("g").as(strataCol),
        col("n_tokens"), col("s_obs"), col("f1"), col("f2"),
        q6(col("s_obs") +
          col("f1").cast("double") * (col("f1") - 1) /
            (lit(2.0) * (col("f2") + 1))).as("chao1"),
        q6(lit(1.0) - col("f1").cast("double") / col("n_tokens")).as("coverage"))
  }

  /** Per-stratum corpus telemetry at sketch cost: total tokens, total
    * documents, and APPROXIMATE distinct tokens / distinct documents via
    * HyperLogLog++ (`approx_count_distinct`) — the per-source dashboard
    * numbers a 100 TB ingest pipeline tracks continuously, where an
    * exact distinct over the token explosion would shuffle every (token)
    * pair just to count them. The sketch shuffles fixed-size registers
    * per (partition, stratum) instead: one pass, map-side combined,
    * bounded state regardless of vocabulary size.
    *
    * HLL++ is a pure function of the input SET (hash-based, register
    * max-merge), so results are deterministic and partitioning-
    * independent — pinned, with the rsd error contract, by `TextSpec`.
    */
  /** @param exact replace the HLL++ sketches with exact distincts —
    *        the oracle/audit mode (same columns, deterministic SQL
    *        semantics). Costs the distinct-aggregate Expand the sketch
    *        exists to avoid; default stays sketch at corpus scale.
    */
  def strataProfile(
      df: DataFrame,
      textCol: String,
      idCol: String,
      strataCol: String,
      rsd: Double = 0.02,
      exact: Boolean = false
  ): DataFrame = {
    // doc-level stats come from the UN-exploded frame: an exact distinct
    // over the token explosion would force a distinct-aggregate Expand
    // duplicating every (stratum, doc, token) row — the token pass must
    // stay sketch-only. Both sides aggregate to one row per stratum, so
    // the join is broadcast-sized.
    def cardinality(c: Column): Column =
      if (exact) count_distinct(c) else approx_count_distinct(c, rsd)
    val tokSide = df
      .select(col(strataCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        cardinality(col("token")).as("approx_vocab"))
    val docSide = df
      .groupBy(col(strataCol))
      .agg(
        count_distinct(col(idCol)).as("n_docs"),
        cardinality(col(idCol)).as("approx_docs"))
    tokSide
      .join(docSide, Seq(strataCol))
      .select(
        col(strataCol), col("n_tokens"), col("n_docs"),
        col("approx_vocab"), col("approx_docs"))
  }

  /** Per-stratum document-length quantiles at sketch cost
    * (Greenwald–Khanna via `percentile_approx`): the distribution half
    * of the T13 dashboard — medians and tails of doc length per
    * language/source without a per-stratum sort. The GK contract is a
    * RANK error bound (≤ 1/accuracy of the stratum size), pinned by
    * TextSpec against exact percentiles; the shuffle carries one
    * bounded sketch per (partition, stratum), never the values.
    */
  def strataQuantiles(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      probs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 1000
  ): DataFrame = {
    val pcts = percentile_approx(
      col("__len"),
      array(probs.map(lit): _*),
      lit(accuracy))
    df.select(col(strataCol), size(split(col(textCol), " ")).as("__len"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), pcts.as("__p"))
      .select(
        Seq(col(strataCol), col("n_docs")) ++
          probs.zipWithIndex.map { case (p, i) =>
            col("__p").getItem(i).as(s"p${(p * 100).round}_tokens")
          }: _*)
  }

  /** Per-stratum EXACT frequent tokens — every token whose occurrence
    * count exceeds 1/`pct` of its stratum's token mass — found at sketch
    * cost: a Misra–Gries pass ([[graft.functions.HeavyHittersAgg]],
    * bounded state per stratum, map-side combined) generates candidates,
    * then one exact counting pass over ONLY candidate occurrences
    * verifies them. Because Misra–Gries guarantees every token with
    * frequency > n/(capacity+1) survives the sketch, capacity ≥ pct − 1
    * makes the candidate set a superset of the true answer and the
    * composed output EXACT and partition-invariant — the standard
    * two-phase frequent-items shape. Nothing vocabulary-sized ever
    * shuffles: phase 1 moves `capacity` counters per (partition,
    * stratum); phase 2 semi-joins the token stream against the
    * broadcast candidate table before its (already map-side-combined)
    * count shuffle.
    *
    * Output: (strataCol, token, cnt, n_tokens) rows with
    * cnt * pct > n_tokens.
    */
  def heavyHitters(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      pct: Int = 100,
      capacity: Int = 256
  ): DataFrame = {
    require(pct >= 2, "pct < 2 has no heavy-hitter reading")
    require(capacity + 1 >= pct,
      s"capacity $capacity cannot guarantee the 1/$pct threshold (need >= ${pct - 1})")
    val toks = df.select(col(strataCol), split(col(textCol), " ").as("__toks"))
    val sketch = toks
      .groupBy(col(strataCol))
      .agg(
        graft.functions.HeavyHittersAgg.heavyHitters(col("__toks"), capacity).as("__cand"),
        sum(size(col("__toks"))).as("n_tokens"))
    val cands = sketch.select(
      col(strataCol), col("n_tokens"), explode(col("__cand.token")).as("token"))
    toks
      .select(col(strataCol), explode(col("__toks")).as("token"))
      .join(broadcast(cands), Seq(strataCol, "token"))
      .groupBy(col(strataCol), col("token"))
      .agg(count(lit(1)).as("cnt"), first(col("n_tokens")).as("n_tokens"))
      .filter(col("cnt") * pct > col("n_tokens"))
  }

  /** Per-stratum Count-Min sketch over token occurrences (T29): one
    * pass, map-side combined, depth·width longs per stratum. `tokenHash`
    * maps a token string to the long the sketch rows hash — the shared
    * md5-60 for oracle replay, xxhash64 for production (q21's trade).
    */
  def cmsSketch(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      width: Int,
      depth: Int,
      seed: Long,
      tokenHash: Column => Column
  ): DataFrame =
    df.select(col(strataCol), explode(split(col(textCol), " ")).as("__tok"))
      .select(col(strataCol), tokenHash(col("__tok")).as("__h"))
      .groupBy(col(strataCol))
      .agg(
        graft.functions.CountMinAgg.countMin(col("__h"), width, depth, seed).as("cms"),
        count(lit(1)).as("n_tokens"))

  /** Point-frequency estimates for `probes` (a token list frame) against
    * every stratum sketch: sketch frame is stratum-sized and the probe
    * list is broadcast, so this never touches the corpus again.
    */
  def cmsEstimates(
      sketches: DataFrame,
      probes: DataFrame,
      probeCol: String,
      strataCol: String,
      width: Int,
      depth: Int,
      seed: Long,
      tokenHash: Column => Column
  ): DataFrame =
    sketches
      .crossJoin(broadcast(probes.select(col(probeCol).as("token"))))
      .select(
        col(strataCol),
        col("token"),
        graft.functions.CmsQuery(
          col("cms"), tokenHash(col("token")), width, depth, seed).as("est"))
}
