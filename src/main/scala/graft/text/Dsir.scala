package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{SharedHash, TopK}

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) —
  * the "pick pretraining data that looks like the target domain"
  * curation step behind domain-adapted corpus construction: score every
  * raw document by how much more likely a TARGET-domain n-gram LM finds
  * it than a BACKGROUND LM ( log w(x) = log p_tgt(x) − log p_bg(x) ),
  * then sample without replacement proportionally to w via the Gumbel
  * top-k trick. Both LMs are [[NgramLm]] stupid-backoff bigram models —
  * the paper's hashed-n-gram generative features, in the same count-
  * ratio family q72 already hash-pins.
  *
  * Scale shape (100 TB): ONE token-stream pass over the raw corpus,
  * joined BY KEY against both models' count tables together (Catalyst
  * broadcasts vocabulary-sized sides, shuffle-joins when they outgrow
  * it — planner's choice, [[NgramLm.score]]'s shape with twice the
  * lookup columns); the per-document reduce is one groupBy sum. The
  * Gumbel noise is the repo's deterministic cross-engine hash (the
  * md5-60 convention), so selection is reproducible on any engine and
  * partitioning — no RNG state, no driver sampling. The top-k is the
  * bounded-heap [[TopK]] aggregate: map-side partial heaps, never a
  * global sort. (For corpus-fraction-sized k, prefer selecting by a
  * key THRESHOLD — computed from a quantile sketch — over materializing
  * a billion-row heap; the k here is a ranked shortlist.)
  */
object Dsir {

  /** Per-document importance weight: (idCol, n_tokens, log_w) with
    * log_w = Σ_tokens [ log p_tgt(tok | prev) − log p_bg(tok | prev) ],
    * UNROUNDED. Per-token probabilities follow [[NgramLm.score]]'s
    * stupid-backoff cases exactly; `oovCount` is the unseen-token
    * pseudo-count (a raw-corpus token may be unseen by either model).
    */
  def logWeights(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      target: NgramLm.Model,
      background: NgramLm.Model,
      oovCount: Double = 0.5
  ): DataFrame = {
    val toks = NgramLm.tokenStream(docs, textCol, idCol)

    def joined(base: DataFrame, m: NgramLm.Model, tag: String): DataFrame =
      base
        .join(m.uni.select(col("token"), col("c1").as(s"__c1t_$tag")), Seq("token"), "left")
        .join(
          m.uni.select(col("token").as("prev"), col("c1").as(s"__c1p_$tag")),
          Seq("prev"), "left")
        .join(
          m.bi.select(col("prev"), col("token"), col("c2").as(s"__c2_$tag")),
          Seq("prev", "token"), "left")
        .crossJoin(broadcast(m.totalDf.select(col("__total").as(s"__total_$tag"))))

    def logp(m: NgramLm.Model, tag: String): Column = {
      val t = col(s"__total_$tag")
      val cu = coalesce(col(s"__c1t_$tag").cast("double"), lit(oovCount))
      when(col("pos") === 0, log(cu / t))
        .otherwise(
          when(col(s"__c2_$tag").isNotNull,
            log(col(s"__c2_$tag").cast("double") / col(s"__c1p_$tag")))
            .otherwise(log(lit(m.alpha) * cu / t)))
    }

    joined(joined(toks, target, "t"), background, "b")
      .withColumn("__lr", logp(target, "t") - logp(background, "b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lr")).as("log_w"))
  }

  /** Gumbel top-k resampling WITHOUT replacement, proportional to the
    * importance weights: each document's key is log_w + Gumbel(0,1)
    * with the Gumbel drawn from the deterministic md5-60 hash of
    * `salt:id` (u ∈ (0,1), g = −ln(−ln u)); the k largest keys are an
    * exact sample-without-replacement ∝ w (Vieira 2014). Output:
    * (rank, idCol, n_tokens, log_w, key), rank 1 = best; ties broken by
    * id ([[TopK]]'s payload order).
    */
  /** (idCol, n_tokens, log_w, __key) — the weights plus their Gumbel
    * keys. u in (0, 1): the 60-bit hash over 2^60, floored away from 0
    * so the double log stays finite.
    */
  private def keyedWeights(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      target: NgramLm.Model,
      background: NgramLm.Model,
      salt: String,
      oovCount: Double
  ): DataFrame = {
    val u = greatest(
      SharedHash.md5Long60(concat(lit(s"$salt:"), col(idCol).cast("string")))
        .cast("double") / lit(1152921504606846976.0),
      lit(1e-18))
    logWeights(docs, textCol, idCol, target, background, oovCount)
      .withColumn("__key", col("log_w") - log(-log(u)))
  }

  def resample(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      target: NgramLm.Model,
      background: NgramLm.Model,
      k: Int,
      salt: String = "dsir",
      oovCount: Double = 0.5
  ): DataFrame = {
    keyedWeights(docs, textCol, idCol, target, background, salt, oovCount)
      .agg(TopK.agg(col("__key"), struct(col(idCol), col("n_tokens"), col("log_w")), k)
        .as("__topk"))
      .select(posexplode(col("__topk")).as(Seq("__r", "__kv")))
      .select(
        (col("__r") + 1).cast("long").as("rank"),
        col(s"__kv.payload.$idCol").as(idCol),
        col("__kv.payload.n_tokens").as("n_tokens"),
        col("__kv.payload.log_w").as("log_w"),
        col("__kv.score").as("key"))
  }

  /** The corpus-fraction selection path the ranked [[resample]] doc
    * comment promises: same Gumbel keys, but the cut is a THRESHOLD
    * from one `approxQuantile` (Greenwald–Khanna) pass — no heap holds
    * a corpus-fraction of rows, and the filter is a row-local map, so
    * selecting 30% of 100 TB costs a sketch pass plus a scan. The
    * realized fraction is exact up to the sketch's rank error
    * (`relErr`); the threshold semantic itself is exact — every kept
    * key >= every dropped key by construction. Output: (idCol,
    * n_tokens, log_w, key), unranked.
    */
  def selectFraction(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      target: NgramLm.Model,
      background: NgramLm.Model,
      fraction: Double,
      salt: String = "dsir",
      oovCount: Double = 0.5,
      relErr: Double = 1e-3
  ): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"fraction must be in (0, 1], got $fraction")
    // deliberately NOT persisted: the scoring join runs once for the
    // sketch and once when the caller consumes the result — two scans
    // beat silently parking a corpus-sized keyed frame in the session
    // cache (the Bm25 lifecycle lesson). Callers selecting repeatedly
    // at different fractions should materialize keyedWeights themselves
    // via [[logWeights]].
    val keyed = keyedWeights(docs, textCol, idCol, target, background, salt, oovCount)
    val thr =
      if (fraction == 1.0) Double.NegativeInfinity
      else keyed.stat.approxQuantile("__key", Array(1.0 - fraction), relErr).head
    keyed
      .where(col("__key") >= thr)
      .select(col(idCol), col("n_tokens"), col("log_w"), col("__key").as("key"))
  }
}
