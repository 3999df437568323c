package graft.text

import org.apache.spark.sql.DataFrame
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
}
