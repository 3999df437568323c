package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): rank words by
  * PageRank over the token co-occurrence graph — the graph-centrality
  * complement to frequency-based keyword signals (tf-idf [[TfIdf]],
  * keyness [[CorpusDiff]]): a word matters if it co-occurs with words
  * that matter, which plain counts can't see.
  *
  * Composition, not a new engine: tokenize row-locally, take adjacent
  * filtered-token pairs per document (one lag window, per-doc
  * partitions — document-bounded, shards on doc id), symmetrize +
  * distinct into an undirected edge set, and hand it to
  * [[graft.graph.PageRank.run]] (dangling mass and all). The graph is
  * vocabulary-sized, so every downstream step is tiny regardless of
  * corpus size — the corpus is touched exactly once.
  */
object TextRank {

  /** Top-`topK` keywords by TextRank score. Tokens shorter than
    * `minLen` are dropped (the cheap stopword proxy for this corpus);
    * adjacency is over the FILTERED sequence (standard TextRank
    * convention), self-pairs from immediate repeats excluded.
    */
  def keywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int = 4,
      iters: Int = 10,
      damping: Double = 0.85,
      topK: Int = 30): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"), posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .where(length(col("tok")) >= minLen)
    val w = Window.partitionBy("doc").orderBy("pos")
    val pairs = toks
      .withColumn("prev", lag(col("tok"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") =!= col("tok"))
    val edges = pairs.select(col("prev").as("src"), col("tok").as("dst"))
      .union(pairs.select(col("tok").as("src"), col("prev").as("dst")))
      .distinct()
    graft.graph.PageRank.run(edges, iters = iters, damping = damping)
      .select(col("node").as("keyword"), round(col("rank"), 8).as("score"))
      .orderBy(col("score").desc, col("keyword"))
      .limit(topK)
  }
}
