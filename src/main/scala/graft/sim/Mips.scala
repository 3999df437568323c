package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Maximum-inner-product search (MIPS) — retrieval where the score is
  * the raw dot product (two-tower recommenders, unnormalized rerankers),
  * NOT cosine: vectors with bigger norms legitimately score higher, so
  * cosine machinery is wrong out of the box.
  *
  *   - [[topK]]: exact brute-force dot-product top-k, the correctness
  *     baseline — same broadcast-queries/scan-corpus-once/bounded-heap
  *     shape as [[Cosine.topK]].
  *   - [[augment]]: the Bachrach et al. (2014) norm reduction — append
  *     √(M² − ‖x‖²) to every corpus vector (query side gets a 0), after
  *     which inner-product order equals COSINE order on the augmented
  *     vectors: corpus norms are all exactly M, and the appended query
  *     0 kills the extra coordinate. That unlocks the ENTIRE cosine ANN
  *     stack ([[AnnIvf]], [[AnnLsh]], [[AnnIvfPq]]) for MIPS at scale;
  *     MipsSpec pins ranking equivalence through [[Cosine.topK]].
  *
  * M is the corpus max norm (one aggregate, a driver scalar — model
  * state); pass `margin` > 1 to leave headroom for appends.
  */
object Mips {

  /** Exact dot-product top-k per query (ties by neighbor id). */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("dot", Cosine.dot(col("qv"), col("nv")))
    TopK.perKey(scored, Seq("qid"), "dot", "nid", k)
      .select(col("qid"), col("nid"), round(col("dot"), 4).as("dot"))
  }

  /** (augmented corpus, augmented-query transform, M): corpus rows gain
    * the √(M²−‖x‖²) coordinate (norm exactly M); apply the returned
    * column function to query vectors (appends 0.0). Fails fast if any
    * vector outgrows M — the caller re-fits or raises `margin`.
    */
  def augment(
      corpus: DataFrame,
      vecCol: String,
      margin: Double = 1.0
  ): (DataFrame, Column => Column, Double) = {
    require(margin >= 1.0, "margin must be >= 1")
    val maxNorm = corpus
      .agg(max(Cosine.norm(col(vecCol)))).head().getDouble(0)
    val m = maxNorm * margin
    val aug = corpus.withColumn(
      vecCol, {
        val n2 = graft.functions.FloatVec.dot(col(vecCol), col(vecCol))
        val extra = sqrt(greatest(lit(0.0), lit(m * m) - n2))
        concat(col(vecCol), array(when(n2 <= m * m, extra)
          .otherwise(raise_error(lit("Mips.augment: vector norm exceeds M — raise margin")))
          .cast("float")))
      })
    val queryTransform: Column => Column =
      v => concat(v, array(lit(0.0f)))
    (aug, queryTransform, m)
  }
}
