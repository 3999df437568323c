package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020 score corpora with a KenLM model and keep
  * the low-perplexity band). The model here is bigram STUPID BACKOFF
  * (Brants et al. 2007, "Large Language Models in Machine Translation"):
  *   p(w | prev) = c2(prev, w) / c1(prev)            if the bigram was seen
  *               = α · c1(w) / total                 otherwise (α = 0.4)
  *   p(w) at position 0 = c1(w) / total
  * — exactly the scheme Brants designed FOR distributed n-gram models:
  * no discount bookkeeping (Kneser–Ney needs global continuation
  * counts), every term is a plain count ratio.
  *
  * Scale shape: the model IS two count frames (unigrams, bigrams) built
  * by one explode + two groupBys — never collected, never broadcast by
  * hand. Scoring joins the token stream against them BY KEY; Catalyst
  * broadcasts the tables when they fit and shuffle-joins when a 100 TB
  * corpus's vocabulary doesn't — the decision stays with the planner,
  * not the API. Everything is codegen'd column algebra (no UDF), which
  * also makes the entire train+score pipeline SQL-replayable — q72
  * hash-checks it end to end against DuckDB.
  */
object NgramLm {

  /** The trained model: unigram counts, bigram counts, and the 1-row
    * total frame (kept as a frame — no driver pre-count blocking plan
    * construction, the TfIdf `__ndocs` pattern).
    */
  final case class Model(uni: DataFrame, bi: DataFrame, totalDf: DataFrame, alpha: Double) {
    /** Release the persisted unigram frame (the MinHashLsh persist
      * lifecycle): call when done scoring with this model — without it a
      * long-lived session accumulates one cached vocabulary frame per
      * trained model until the session-wide cache sweep.
      */
    def release(): Unit = uni.unpersist(false)
  }

  /** (id, pos, token, prev) — ONE explode; `prev` read from the array
    * row-locally (element_at is 1-based, posexplode 0-based, so
    * element_at(toks, pos) is exactly the previous token).
    */
  private[text] def tokenStream(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), posexplode(col("__toks")).as(Seq("pos", "token")),
        col("__toks"))
      .withColumn("prev", when(col("pos") >= 1, element_at(col("__toks"), col("pos"))))
      .drop("__toks")

  /** Train on a corpus: unigram + bigram count frames. The unigram
    * frame is persisted — [[score]] references it twice (token and prev
    * joins) and the total once, and each reference would otherwise
    * re-explode the corpus (the TfIdf tf-persist lesson). The cache
    * holds vocabulary-sized count rows, not the token stream.
    */
  def train(df: DataFrame, textCol: String, idCol: String, alpha: Double = 0.4): Model = {
    val toks = tokenStream(df, textCol, idCol)
    val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c1")).persist()
    val bi = toks
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("token"))
      .agg(count(lit(1)).as("c2"))
    val total = uni.agg(sum(col("c1")).cast("double").as("__total"))
    Model(uni, bi, total, alpha)
  }

  /** Per-document perplexity: (idCol, n_tokens, avg_logprob, ppl).
    * `oovCount` is the pseudo-count an unseen token falls back to —
    * only reachable when scoring a corpus the model wasn't trained on.
    */
  def score(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: Model,
      oovCount: Double = 0.5
  ): DataFrame = {
    val toks = tokenStream(df, textCol, idCol)
    val t: Column = col("__total")
    val cu: Column = coalesce(col("__c1t").cast("double"), lit(oovCount))
    val scored = toks
      .join(model.uni.select(col("token"), col("c1").as("__c1t")), Seq("token"), "left")
      .join(
        model.uni.select(col("token").as("prev"), col("c1").as("__c1p")),
        Seq("prev"), "left")
      .join(
        model.bi.select(col("prev"), col("token"), col("c2").as("__c2")),
        Seq("prev", "token"), "left")
      .crossJoin(broadcast(model.totalDf))
      .withColumn(
        "__logp",
        when(col("pos") === 0, log(cu / t))
          .otherwise(
            when(col("__c2").isNotNull, log(col("__c2").cast("double") / col("__c1p")))
              .otherwise(log(lit(model.alpha) * cu / t))))
    scored
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(col("__logp")), 4).as("avg_logprob"),
        round(exp(-avg(col("__logp"))), 2).as("ppl"))
  }

  /** Interpolated Kneser–Ney bigram model (fixed discount): the
    * continuation-count upgrade of the stupid-backoff [[Model]] —
    * P(w|v) = max(c(vw)−d, 0)/c(v·) + d·N₁₊(v·)/c(v·)·P_cont(w) with
    * P_cont(w) = N₁₊(·w)/N₁₊(··). Brants' objection to KN at scale is
    * the GLOBAL continuation counts; distributed they are just two
    * more groupBys over the bigram frame (type counts, not token
    * counts), so the whole trainer stays column algebra and the oracle
    * replays it. Frames are vocabulary/bigram-type-sized, never
    * collected.
    */
  final case class KnModel(
      bi: DataFrame,      // (prev, token, c2)
      ctx: DataFrame,     // (prev, ctot = c(v·), n1fwd = N₁₊(v·))
      cont: DataFrame,    // (token, nprec = N₁₊(·w))
      totalsDf: DataFrame, // 1 row: nbt = N₁₊(··)
      discount: Double) {
    def release(): Unit = bi.unpersist(false)
  }

  def trainKN(df: DataFrame, textCol: String, idCol: String,
      discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1, "KN discount in (0,1)")
    val toks = tokenStream(df, textCol, idCol)
    val bi = toks
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("token"))
      .agg(count(lit(1)).as("c2"))
      .persist() // three derived frames below re-read it
    val ctx = bi.groupBy("prev")
      .agg(sum("c2").as("ctot"), count(lit(1)).as("n1fwd"))
    val cont = bi.groupBy("token").agg(count(lit(1)).as("nprec"))
    val totals = bi.agg(count(lit(1)).cast("double").as("nbt"))
    KnModel(bi, ctx, cont, totals, discount)
  }

  /** Per-document KN perplexity, the [[score]] shape: (idCol, n_tokens,
    * avg_logprob 4dp, ppl 2dp). Position 0 and unseen contexts score
    * as P_cont(w); tokens with no continuation mass floor at `pFloor`
    * (only reachable scoring off-model corpora).
    */
  def scoreKN(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: KnModel,
      pFloor: Double = 1e-10): DataFrame = {
    val d = model.discount
    val toks = tokenStream(df, textCol, idCol)
    val joined = toks
      .join(model.bi.select(col("prev"), col("token"), col("c2").as("__c2")),
        Seq("prev", "token"), "left")
      .join(model.ctx.select(col("prev"), col("ctot").as("__ctot"),
        col("n1fwd").as("__n1f")), Seq("prev"), "left")
      .join(model.cont.select(col("token"), col("nprec").as("__nprec")),
        Seq("token"), "left")
      .crossJoin(broadcast(model.totalsDf))
    val pcont = coalesce(col("__nprec").cast("double") / col("nbt"), lit(0.0))
    val pSeen =
      greatest(coalesce(col("__c2").cast("double"), lit(0.0)) - lit(d), lit(0.0)) /
        col("__ctot").cast("double") +
        lit(d) * col("__n1f").cast("double") / col("__ctot").cast("double") * pcont
    val p = when(col("pos") === 0 || col("__ctot").isNull, pcont).otherwise(pSeen)
    joined
      .withColumn("__logp", log(greatest(p, lit(pFloor))))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(col("__logp")), 4).as("avg_logprob"),
        round(exp(-avg(col("__logp"))), 2).as("ppl"))
  }

  /** Persist a trained model — train the LM on the 100 TB corpus once,
    * score/filter/DSIR from any session. The count frames are
    * VOCABULARY-sized, not driver-bounded, so they are written as
    * ordinary distributed parquet datasets under `path` and REFERENCED
    * from a meta-only [[graft.sources.IndexCatalog]] entry (the
    * graph-ANN pattern — catalog parts proper are reserved for
    * driver-bounded state); `alpha` rides in props so the serving side
    * scores with the backoff the model was counted under.
    */
  def saveModel(
      spark: org.apache.spark.sql.SparkSession,
      model: Model,
      path: String
  ): Unit = {
    model.uni.write.mode("overwrite").parquet(s"$path/uni")
    model.bi.write.mode("overwrite").parquet(s"$path/bi")
    model.totalDf.coalesce(1).write.mode("overwrite").parquet(s"$path/total")
    graft.sources.IndexCatalog.write(
      spark, path, "ngram_lm",
      Map("alpha" -> model.alpha.toString,
        "uni" -> "uni", "bi" -> "bi", "total" -> "total"),
      Seq.empty)
  }

  /** Load a persisted model; the unigram frame comes back persisted,
    * matching [[train]]'s contract (release with
    * [[Model.release]]).
    */
  def loadModel(
      spark: org.apache.spark.sql.SparkSession,
      path: String
  ): Model = {
    val meta = graft.sources.IndexCatalog.open(spark, path, "ngram_lm")
    Model(
      spark.read.parquet(s"$path/${meta.prop("uni")}").persist(),
      spark.read.parquet(s"$path/${meta.prop("bi")}"),
      spark.read.parquet(s"$path/${meta.prop("total")}"),
      meta.prop("alpha").toDouble)
  }

  /** The gate: keep documents in the wanted perplexity band (CCNet keeps
    * the low band; a floor also exists to drop degenerate repetition,
    * which scores unnaturally LOW).
    */
  def perplexityFilter(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: Model,
      maxPpl: Double,
      minPpl: Double = 0.0
  ): DataFrame =
    df.join(
      score(df, textCol, idCol, model)
        .where(col("ppl") <= maxPpl && col("ppl") >= minPpl)
        .select(col(idCol), col("ppl")),
      Seq(idCol))
}
