package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{BitOps, FloatVec, TopK}

/** Binary (1-bit) sign-quantized ANN — the 32× compression tier below
  * [[AnnSq8]]'s 4×: each dimension keeps only its sign, distance is
  * Hamming over packed words (XOR + popcount, [[graft.functions.Hamming]]),
  * and a short exact-cosine rerank recovers ranking quality (the
  * standard binary-quantization serving shape: popcount scan →
  * shortlist → rerank, cf. Charikar 2002 — sign-random-projection LSH
  * with the identity projection, and the BQ mode in modern vector
  * stores).
  *
  * Why it scales: the packed corpus is d/8 bytes per vector and never
  * shuffles — queries broadcast, the popcount scan is one fused codegen
  * loop per (query, vector) pair, and only shortlist rows (queries ×
  * rerank) rejoin the fat float vectors for the exact pass. No
  * training, no codebooks: encode is stateless, so ingest is a map and
  * incremental append is trivial.
  *
  * Determinism: sign packing is an exact function of the floats
  * (bit = x < 0; -0.0 packs as 0 on both engines), Hamming is integer,
  * and ties break on (distance, nid) — so the WHOLE pipeline including
  * the shortlist cut replays in DuckDB, unlike recall-floor-only ANN
  * checks.
  */
object AnnBinary {

  /** (idCol, bits array<long>) — 32 sign bits per word. */
  def encode(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), BitOps.pack(col(vecCol)).as("bits"))

  /** Top-k by Hamming shortlist + exact cosine rerank.
    *
    * @param shortlist candidates kept per query from the popcount scan
    *                  (deterministic (hamming asc, nid asc) order);
    *                  0 ⇒ no rerank, return Hamming top-k directly.
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int = 0
  ): DataFrame = {
    val codes = encode(corpus, idCol, vecCol).withColumnRenamed(idCol, "nid")
    val qs = queries.select(
      col(idCol).as("qid"),
      col(vecCol).as("qv"),
      BitOps.pack(col(vecCol)).as("qbits"))

    val scored = codes
      .crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn("hamming", BitOps.hamming(col("qbits"), col("bits")))

    if (shortlist <= 0) {
      // negated distance: TopK keeps HIGHEST score, ties → smaller nid
      TopK.perKey(
        scored.withColumn("neg_h", -col("hamming")),
        Seq("qid"), "neg_h", "nid", k)
        .select(col("qid"), col("nid"), (-col("neg_h")).cast("long").as("hamming"))
    } else {
      val cand = TopK.perKey(
        scored.withColumn("neg_h", -col("hamming")),
        Seq("qid"), "neg_h", "nid", math.max(k, shortlist), carry = Seq("qv"))
      val exact = cand
        .select(col("qid"), col("qv"), col("nid"))
        .join(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")), Seq("nid"))
        .withColumn(
          "cos_sim",
          FloatVec.dot(col("qv"), col("nv")) /
            (FloatVec.norm(col("qv")) * FloatVec.norm(col("nv"))))
      TopK.perKey(exact, Seq("qid"), "cos_sim", "nid", k)
        .select(col("qid"), col("nid"), round(col("cos_sim"), 4).as("cos_sim"))
    }
  }
}
