package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Margin-based parallel-pair mining (Artetxe & Schwenk 2019) — the
  * multilingual-pipeline operator that builds bitext from two
  * monolingual embedding sets: for each source vector take its best
  * target candidate and score the RATIO margin
  *
  *   margin(x, y) = cos(x, y) / (½·(avgTopK(x) + avgTopK(y)))
  *
  * where avgTopK(v) is the mean cosine of v to its k nearest
  * OTHER-SIDE neighbors. Raw cosine thresholds fail on hub vectors
  * (high similarity to everything); dividing by both sides' local
  * similarity level cancels hubness, which is why margin mining is the
  * standard for LASER/CCMatrix-style corpus construction.
  *
  * Shape: candidate generation here is the exact brute-force cosine
  * (the [[Cosine.topK]] primitive — broadcast queries, bounded-heap
  * per-key top-k, no window); at 100 TB swap the candidate generator
  * for an ANN index ([[AnnIvfPq]]/[[AnnGraph]]) — the margin
  * re-scoring shape on top is unchanged. Both directions' top-k ride
  * the SAME scored frame: one join pass, two bounded-heap aggregates.
  */
object Bitext {

  /** (src_id, tgt_id, cos_sim, margin) for forward-best pairs passing
    * `minMargin`, 4dp. `src`/`tgt` need (idCol, vecCol); ids may
    * overlap across sides (they are namespaced internally).
    */
  def mineParallel(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      minMargin: Double = 1.05,
      minCos: Double = 0.5
  ): DataFrame = {
    val s = src.select(col(idCol).as("sid"), col(vecCol).as("sv"),
      Cosine.norm(col(vecCol)).as("snorm"))
    val t = tgt.select(col(idCol).as("tid"), col(vecCol).as("tv"),
      Cosine.norm(col(vecCol)).as("tnorm"))
    val scored = t.join(broadcast(s))
      .withColumn("cos", Cosine.cosine(col("sv"), col("tv"), col("snorm"), col("tnorm")))
      .select(col("sid"), col("tid"), col("cos"))
      .persist()

    val fwd = TopK.perKey(scored, Seq("sid"), "cos", "tid", k)
    val bwd = TopK.perKey(scored, Seq("tid"), "cos", "sid", k)
    val avgS = fwd.groupBy("sid").agg(avg("cos").as("avg_s"))
    val avgT = bwd.groupBy("tid").agg(avg("cos").as("avg_t"))
    val best = TopK.perKey(scored, Seq("sid"), "cos", "tid", 1)

    val out = best
      .join(broadcast(avgS), Seq("sid"))
      .join(broadcast(avgT), Seq("tid"))
      .withColumn("margin", col("cos") / ((col("avg_s") + col("avg_t")) / 2.0))
      // both gates: the RATIO margin cancels hubness, the absolute
      // floor rejects orphans whose whole neighborhood is noise (a
      // top-1 is always above its own top-k mean, so ratio alone
      // cannot reject a source with no counterpart — CCMatrix floors
      // similarity for the same reason)
      .where(col("margin") >= minMargin && col("cos") >= minCos)
      .select(
        col("sid").as("src_id"), col("tid").as("tgt_id"),
        round(col("cos"), 4).as("cos_sim"), round(col("margin"), 4).as("margin"))
    // materialize (small: ≤1 row per source) so the scored frame can be
    // released without the result's plan re-deriving it
    val result = out.localCheckpoint(true)
    scored.unpersist(false)
    result
  }
}
