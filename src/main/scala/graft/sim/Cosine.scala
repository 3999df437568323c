package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopK

/** Embedding cosine similarity operators (SURVEY.md §2 P5–P6).
  *
  * Vectors are `array<float>` columns; all arithmetic is `zip_with` /
  * `aggregate` column algebra in double precision — sequential, ordered,
  * deterministic summation (parity with the DuckDB oracle), inside
  * codegen, no UDFs.
  *
  * `topK` broadcasts the (small) query side against the corpus — the
  * corpus is scanned once, never shuffled. `nearDupPairs` is the exact
  * all-pairs baseline and must be blocked/limited by the caller;
  * [[AnnLsh]] is the scale path.
  */
object Cosine {

  def dot(a: Column, b: Column): Column = graft.functions.FloatVec.dot(a, b)

  def norm(v: Column): Column = graft.functions.FloatVec.norm(v)

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself), ties broken by neighbor id.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"), norm(col(vecCol)).as("nn"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .withColumn("cos_sim", cosine(col("qv"), col("nv"), col("qn"), col("nn")))
    // bounded-heap top-k aggregate (map-side combined), not a window:
    // the corpus-sized scored frame reduces to k rows per query per map
    // partition BEFORE the exchange
    TopK.perKey(scored, Seq("qid"), "cos_sim", "nid", k)
      .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Mutual k-nearest-neighbor pairs from ANY (qid, nid, cos_sim)
    * shortlist frame: (a, b) kept iff b ∈ topK(a) AND a ∈ topK(b),
    * emitted once as id-ordered (id_a < id_b). Mutuality is the
    * standard reciprocal filter on kNN graphs — it kills hub edges
    * (a point inside a dense cluster shortlists a far-away hub, but
    * the hub's own shortlist is full of its dense neighborhood) before
    * dedup clustering or bitext alignment consumes the graph. One
    * self-join of the shortlist on the swapped key pair —
    * #queries×k rows, never corpus-sized; composes unchanged with any
    * P7 ANN shortlist at 100 TB.
    */
  def mutualPairs(topk: DataFrame): DataFrame = {
    val rev = topk.select(col("qid").as("r_qid"), col("nid").as("r_nid"))
    topk
      .join(rev, col("qid") === col("r_nid") && col("nid") === col("r_qid"))
      .where(col("qid") < col("nid"))
      .select(col("qid").as("id_a"), col("nid").as("id_b"), col("cos_sim"))
  }

  /** Brute-force mutual kNN over one vector frame ([[topK]] with the
    * frame as both sides, then [[mutualPairs]]) — the small-corpus /
    * correctness baseline; swap the shortlist source for an ANN serve
    * path at scale.
    */
  def mutualKnn(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    mutualPairs(topK(df, df, idCol, vecCol, k))

  /** Exact near-duplicate pairs by cosine ≥ threshold (id_a < id_b).
    * All-pairs: correctness baseline for [[AnnLsh]]; bound the input.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double
  ): DataFrame = {
    val v = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("nrm"))
    val l = v.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val r = v.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("nrm").as("n_b"))
    l.join(r, col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("v_a"), col("v_b"), col("n_a"), col("n_b")))
      .where(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Semantic decontamination: per CORPUS row, the max cosine against a
    * (small) PROBE set — eval/benchmark embeddings — and a `hit` flag
    * at `threshold`. The embedding-space complement of the span-based
    * [[graft.dedup.SpanDedup.contamination]]: paraphrased or translated
    * test material carries near-identical embeddings while sharing no
    * 8-gram, so span decontamination alone misses it.
    *
    * Scale shape: the probe set is broadcast (benchmarks are thousands
    * of rows, the corpus is the 100 TB side) and the corpus is scanned
    * ONCE — the per-row max is a map-side-combined aggregate over the
    * probe-joined rows, never a shuffle of the corpus. The corpus-side
    * norm is hoisted before the join so a row's O(dims) norm is
    * computed once, not once per probe.
    *
    * `excludeSelfId` is for a probe DRAWN FROM the corpus (same id
    * space): it skips the trivial self-pair. Leave it false for a real
    * cross-corpus eval set — its ids are unrelated to the corpus's,
    * and an accidental id collision must NOT suppress a genuine hit.
    */
  def decontaminate(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      excludeSelfId: Boolean = false
  ): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
    val p = probe.select(
      col(idCol).as("__pid"), col(vecCol).as("__pv"), norm(col(vecCol)).as("__pn"))
    c.join(broadcast(p), if (excludeSelfId) col(idCol) =!= col("__pid") else lit(true))
      .groupBy(col(idCol))
      .agg(max(cosine(col("__cv"), col("__pv"), col("__cn"), col("__pn"))).as("__mc"))
      .select(
        col(idCol),
        round(col("__mc"), 4).as("max_probe_cos"),
        (col("__mc") >= threshold).cast("int").as("hit"))
  }
}
