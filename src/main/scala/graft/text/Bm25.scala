package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** BM25 ranked retrieval (Robertson–Spärck Jones probabilistic weighting
  * with the Okapi saturation; Robertson & Zaragoza 2009) over a document
  * corpus — the classic relevance scorer a data pipeline uses to pull
  * task-relevant training subsets out of a crawl (and the lexical
  * complement of the embedding-side [[graft.sim.Cosine]] retrieval).
  *
  * Scale shape (100 TB): the postings build is one shuffle of exploded
  * tokens into (doc, term) partial counts (map-side combined) plus a
  * vocabulary-sized document-frequency aggregate. Scoring inverts the
  * usual index lookup: the QUERY table (queries × terms, enriched with
  * idf) is broadcast against the postings frame, so the corpus never
  * re-shuffles; per-query top-k is the bounded-heap [[TopK]] aggregate —
  * map-side partial heaps, no window, no full sort.
  *
  * Determinism: a (query, doc) score sums one saturated-tf term per
  * query slot IN SLOT ORDER (a fixed-order fold, not a shuffle-order
  * float sum), so the same doubles come out on any engine that computes
  * the same formula — which is what lets q78's DuckDB oracle pin every
  * score to 4 decimals.
  */
object Bm25 {

  /** Top-k docs per query. `queries`: (qid, qpos, term) with qpos in
    * 0 until qLen — a query is a bag of term slots, each contributing
    * idf(term) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * Output: qid, rank (1-based), `idCol`, score (raw double).
    */
  def topK(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame,
      k: Int = 5,
      qLen: Int = 3,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val (out, tf) = topKPlan(docs, textCol, idCol, queries, k, qLen, k1, b)
    // the result is only #queries × k rows: materialize it eagerly and
    // free the corpus-sized postings cache here, rather than leaving it
    // for a session cache sweep library callers don't get
    val materialized = out.localCheckpoint(true)
    tf.unpersist(false)
    materialized
  }

  /** The lazy scoring plan plus its persisted postings intermediate —
    * the [[graft.ops.TrainingShards.shardsPlan]] split: plan specs pin
    * THIS plan (the one that actually executes inside [[topK]]);
    * [[topK]] owns the materialize-then-release lifecycle.
    */
  private[graft] def topKPlan(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      queries: DataFrame,
      k: Int,
      qLen: Int,
      k1: Double,
      b: Double
  ): (DataFrame, DataFrame) = {
    val withDl = docs
      .select(col(idCol), split(col(textCol), " ").as("__ts"))
      .withColumn("__dl", size(col("__ts")))

    // postings: one shuffle of (doc, term) partial counts. Persisted —
    // both the df aggregate and the scoring join read it, and without
    // the persist the corpus would tokenize twice (the q76 fingerprint-
    // frame pattern). Released before return: the result is only
    // #queries × k rows, so it is materialized eagerly (localCheckpoint)
    // and the corpus-sized cache freed here rather than left for a
    // session cache sweep library callers don't get.
    val tf = withDl
      .select(col(idCol), col("__dl"), explode(col("__ts")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), first(col("__dl")).as("__dl"))
      .persist()

    // corpus stats: two tiny metadata aggregates
    val statsRow = withDl.agg(count(lit(1)).as("n"), avg(col("__dl")).as("avgdl")).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1)

    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))

    // idf rides on the query table (queries × terms rows — broadcast side)
    val qEnriched = queries.join(dfFrame, Seq("term")).withColumn(
      "__idf",
      log(lit(1.0) + (lit(nDocs.toDouble) - col("__df") + 0.5) / (col("__df") + 0.5)))

    val scoredTerms = tf
      .join(broadcast(qEnriched), Seq("term"))
      .withColumn(
        "__s",
        col("__idf") * (col("__tf") * (k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / avgdl)))

    // fixed-order slot sum: slot p's (unique) contribution, p ascending
    val slotSum = (0 until qLen)
      .map(p => coalesce(max(when(col("qpos") === p, col("__s"))), lit(0.0)))
      .reduce(_ + _)
    val scored = scoredTerms.groupBy(col("qid"), col(idCol)).agg(slotSum.as("score"))

    val out = scored
      .groupBy(col("qid"))
      .agg(TopK.agg(col("score"), col(idCol), k).as("__topk"))
      .select(col("qid"), posexplode(col("__topk")).as(Seq("__r", "__kv")))
      .select(
        col("qid"),
        (col("__r") + 1).cast("long").as("rank"),
        col("__kv.payload").as(idCol),
        col("__kv.score").as("score"))
    (out, tf)
  }
}
