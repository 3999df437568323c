package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.text.{CorpusOverlap, Keyness, TextStats}

/** Per-source "dataset card" — the one-table summary a corpus release
  * ships: volume, vocabulary size (sketched), mean quality, and
  * distribution drift, per source. A composition of operators each
  * verified on its own ([[CorpusOverlap]] KMV estimates, [[TextStats]]
  * quality, [[Keyness]] JS divergence) — and, per the q54/q111/q120
  * composition argument, the REPORT itself is oracle-replayed
  * end-to-end, because independently-correct stages can still disagree
  * at the seams.
  *
  * Cost: the corpus is scanned once per ingredient family (tokens ×2,
  * quality ×1) with every aggregate map-side combined; all joins are
  * #sources-sized broadcasts.
  */
object SourceReport {

  /** (source, n_docs, n_tokens, distinct_est, mean_quality, js_div). */
  def build(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      kmvK: Int = 16): DataFrame = {
    val volume = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
    val vocab = CorpusOverlap
      .sketches(docs, textCol, sourceCol, kmvK)
      .select(col("corpus").as("source"), col("distinct_est"))
    val quality = TextStats
      .withQuality(docs, textCol)
      .groupBy(col(sourceCol).as("source"))
      .agg(round(avg(col("quality")), 4).as("mean_quality"))
    val drift = Keyness
      .jsDivergence(docs, textCol, sourceCol)
      .select(col("corpus").as("source"), col("js_div"))
    volume
      .join(broadcast(vocab), Seq("source"))
      .join(broadcast(quality), Seq("source"))
      .join(broadcast(drift), Seq("source"))
  }
}
