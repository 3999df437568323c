package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Hybrid retrieval by Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher 2009): fuse any number of per-query rankings — lexical
  * ([[Bm25]], tf-idf cosine), embedding ANN, anything that emits
  * (qid, id, rank) — into one list by
  *
  *   rrf(q, d) = Σ_systems 1 / (k0 + rank_s(q, d))
  *
  * with a document missing from a system contributing 0. RRF is the
  * standard score-free fusion for RAG-style retrieval stacks: it needs
  * no score calibration between systems (BM25 scores and cosines are
  * not comparable), only ranks — which also makes it exactly
  * replayable cross-engine.
  *
  * Scale shape (100 TB): the inputs are already top-k shortlists
  * (#queries × k rows each — the corpus never enters this operator), so
  * fusion is a union + one map-side-combined groupBy over shortlist
  * rows, and the final per-query top-k is the bounded-heap [[TopK]]
  * aggregate. Determinism: the per-system contribution folds in FIXED
  * system order (one slot per input, [[Bm25]]'s slot-sum pattern — not
  * a shuffle-order float sum), ranks are integers, and ties break by
  * id in the heap's payload order.
  */
object Hybrid {

  /** Fuse ranked shortlists into (qid, rank, id, rrf_score). Each input
    * frame must carry (qid, id, rank) with rank 1-based and unique per
    * (system, qid). `k0` is RRF's damping constant (60 in the paper —
    * makes one top rank worth ~ a handful of mid-list appearances).
    */
  def rrf(systems: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(systems.nonEmpty, "at least one ranked system")
    val n = systems.length
    val tagged = systems.zipWithIndex.map { case (s, i) =>
      s.select(col("qid"), col("id"), col("rank").cast("long").as("rank"),
        lit(i).as("__sys"))
    }.reduce(_ unionByName _)
    val slotSum = (0 until n)
      .map(i => coalesce(max(when(col("__sys") === i, lit(1.0) / (col("rank") + lit(k0)))),
        lit(0.0)))
      .reduce(_ + _)
    tagged
      .groupBy(col("qid"), col("id"))
      .agg(slotSum.as("rrf"))
      .groupBy(col("qid"))
      .agg(TopK.agg(col("rrf"), col("id"), k).as("__topk"))
      .select(col("qid"), posexplode(col("__topk")).as(Seq("__r", "__kv")))
      .select(
        col("qid"),
        (col("__r") + 1).cast("long").as("rank"),
        col("__kv.payload").as("id"),
        col("__kv.score").as("rrf_score"))
  }
}
