package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BitOps, FloatVec, TopK}
import graft.sources.IndexCatalog

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

  // ---- persisted serving layout ([[IndexCatalog]]) -------------------

  private val Kind = "binary_ann"

  /** Persist the packed corpus as a catalog entry. The code table is
    * corpus-sized (d/8 bytes + id per row), so it is written as a
    * REFERENCED parquet dataset under the entry (the [[IndexCatalog]]
    * corpus-payload convention), not a driver-bounded part: the
    * popcount scan side of a fresh session never touches float
    * vectors. `dims` travels in props so a serve under different
    * geometry is refused, not silently wrong. Encoding is stateless,
    * so append = encode the new batch and write it next to the old
    * codes — no retraining, no merge.
    */
  def saveCodes(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      dims: Int): Unit = {
    encode(corpus, idCol, vecCol).write.mode("overwrite").parquet(s"$path/codes")
    IndexCatalog.write(
      spark, path, Kind,
      Map("dims" -> dims.toString, "codes" -> s"$path/codes"),
      Seq.empty)
  }

  def appendCodes(
      spark: SparkSession,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String): Unit = {
    val meta = IndexCatalog.open(spark, path, Kind)
    encode(corpus, idCol, vecCol).write.mode("append").parquet(meta.prop("codes"))
  }

  /** [[topK]] served from persisted codes: the Hamming scan reads the
    * stored packed table (never the float corpus); only the rerank
    * shortlist joins `corpus` for exact vectors.
    */
  def topKIndexed(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      k: Int,
      shortlist: Int
  ): DataFrame = {
    val meta = IndexCatalog.open(spark, path, Kind)
    val dims = meta.propInt("dims")
    val codes = spark.read.parquet(meta.prop("codes")).withColumnRenamed(idCol, "nid")
    require(shortlist > 0, "topKIndexed serves the rerank path; shortlist must be > 0")
    // geometry guard: a query packed under different dims must fail
    // loudly (truncated Hamming is silently wrong, the worst failure)
    val qs = queries.select(
      col(idCol).as("qid"),
      col(vecCol).as("qv"),
      when(
        size(col(vecCol)) === dims,
        BitOps.pack(col(vecCol)))
        .otherwise(raise_error(concat(
          lit(s"AnnBinary: query vector dims != index dims $dims, got "),
          size(col(vecCol)).cast("string"))))
        .as("qbits"))

    val scored = codes
      .crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn("hamming", BitOps.hamming(col("qbits"), col("bits")))
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
