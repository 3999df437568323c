package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse TF-IDF document vectors in LONG format — (doc, token, weight)
  * rows, the scale-correct sparse representation in Spark: no row ever
  * holds a vocabulary-sized array, every stage is a plain shuffle on a
  * key, and Zipf-skewed vocabularies are handled by pruning rather than
  * by densification.
  *
  * Shapes (all derived from ONE explode of the corpus):
  *   tf:  explode + groupBy(doc, token)            — 1 shuffle
  *   df:  groupBy(token) over the tf frame         — 1 shuffle of the
  *        (already much smaller) tf frame, NOT a second corpus scan
  *   idf: scikit-learn smoothed convention ln((1+N)/(1+df)) + 1
  *
  * Scale levers (the classic sparse-retrieval tricks):
  *   - `maxDfFrac` drops head tokens (df > frac·N). They carry the
  *     least signal and cause the quadratic posting-list blowup in
  *     [[similarityJoin]] — pruning them is what keeps the self-join
  *     near-linear on Zipfian corpora.
  *   - `minDf` drops hapax noise, shrinking the vocab table.
  */
object TfIdf {

  /** (idCol, token, tf, tfidf) — un-normalized sparse vectors.
    *
    * `nDocs = Some(n)` takes the caller's count; `None` derives it INSIDE
    * the pipeline as a broadcast 1-row `count_distinct(doc)` over the tf
    * frame — every doc emits ≥1 token row (split of "" is [""]), so the
    * count is exact and there is no driver-side pre-count blocking plan
    * construction (SURVEY §8's metadata lesson). The count aggregates
    * the CORPUS frame's id column directly — one cheap pruned scan of
    * the source, NOT a third reference to the explode→groupBy tf
    * subtree (which would re-shingle the corpus; and persisting tf
    * instead would leak a cached frame the library never gets to
    * release, since this method is lazy). The tf subtree is referenced
    * exactly twice (doc_freq + the final join), the same as the
    * explicit-nDocs path; callers that reuse the result materialize it
    * themselves (similarityJoin's persist + localCheckpoint pattern).
    */
  def vectors(
      df: DataFrame,
      textCol: String,
      idCol: String,
      nDocs: Option[Long] = None,
      minDf: Long = 1,
      maxDfFrac: Double = 1.0
  ): DataFrame = {
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val n: Column = nDocs match {
      case Some(v) => lit(v.toDouble)
      case None    => col("__ndocs").cast("double")
    }
    val dfreq = tf
      .groupBy(col("token"))
      .agg(count(lit(1)).as("doc_freq"))
    val withN = nDocs match {
      case Some(_) => dfreq
      case None =>
        dfreq.crossJoin(broadcast(df.agg(count_distinct(col(idCol)).as("__ndocs"))))
    }
    val idf = withN
      .where(col("doc_freq") >= minDf && col("doc_freq") <= n * maxDfFrac)
      .withColumn("idf", log((lit(1.0) + n) / (col("doc_freq") + lit(1.0))) + lit(1.0))
    tf.join(idf.select("token", "idf"), Seq("token"))
      .select(col(idCol), col("token"), col("tf"), (col("tf") * col("idf")).as("tfidf"))
  }

  /** L2-normalize to unit vectors: one window aggregate over the doc key
    * (no second frame + join). Output column `w` replaces `tfidf`.
    */
  def unitVectors(vec: DataFrame, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
    vec
      .withColumn("w", col("tfidf") / sqrt(sum(col("tfidf") * col("tfidf")).over(w)))
      .drop("tf", "tfidf")
  }

  /** Top-k tokens per document by tf-idf, ties broken by token text so
    * the result is deterministic and cross-engine comparable. Bounded-heap
    * [[graft.functions.TopK]] aggregate — k rows per doc per map partition
    * through the exchange, not every (doc, token) row.
    */
  def topTerms(vec: DataFrame, idCol: String, k: Int): DataFrame =
    graft.functions.TopK.perKey(vec, Seq(idCol), "tfidf", "token", k)
      .select(col(idCol), col("token"), col("tfidf"))

  /** All-pairs cosine similarity ≥ `threshold` over unit tf-idf vectors,
    * as the textbook posting-list self-join: pairs are generated ONLY
    * for documents sharing a token (join on token), then one groupBy
    * sums the per-token products — for unit vectors that sum IS the
    * cosine. Never a cross join. On Zipfian corpora the head tokens
    * dominate the pair count — prune them with `maxDfFrac` in
    * [[vectors]] before calling this (the standard trick; those tokens
    * carry the least discriminative weight anyway).
    */
  def similarityJoin(unitVec: DataFrame, idCol: String, threshold: Double): DataFrame = {
    // both join sides read the same vector frame: persist so the
    // explode→tf→idf→normalize pipeline runs once, checkpoint the
    // (small) pair result, release the vectors (MinHashLsh pattern)
    val cached = unitVec.persist()
    val a = cached.select(col(idCol).as("id_a"), col("token"), col("w").as("wa"))
    val b = cached.select(col(idCol).as("id_b"), col("token"), col("w").as("wb"))
    val out = a
      .join(b, Seq("token"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa") * col("wb")).as("cos"))
      .where(col("cos") >= threshold)
      .localCheckpoint()
    cached.unpersist(false)
    out
  }
}
