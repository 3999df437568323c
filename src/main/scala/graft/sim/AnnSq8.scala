package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, Sq8Ops, TopK}
import graft.sources.IndexCatalog

/** SQ8 scalar-quantized ANN — SURVEY.md §2 P7i.
  *
  * Per-dimension 8-bit affine quantization (the Faiss `ScalarQuantizer`
  * QT_8bit family): corpus vectors shrink 4× (d floats → d bytes) with
  * near-exact recall and NO codebook training — the memory-bound-scan
  * fix when PQ's 32–64× compression (and its approximation error) is
  * more than the workload needs, and the natural middle tier between
  * raw floats and [[AnnPq]] codes.
  *
  * Fit is ONE aggregate pass: per-dimension min/max via posexplode →
  * hash aggregate (map-side combined — the shuffle carries d rows per
  * map partition, not the corpus) → collect of exactly `dims` rows,
  * driver-bounded model state by definition (the [[AnnIvf]] centroid
  * justification). Deterministic: min/max are order-free.
  *
  * Scoring is asymmetric — the query stays float, codes decode inside
  * one fused codegen loop ([[Sq8Ops.adcDot]]), the decoded vector never
  * materializes. Queries broadcast; the byte-code corpus is scanned
  * once, never shuffled; the shortlist is the bounded-heap TopK
  * aggregate; `rerank` re-scores a short candidate list with exact
  * cosine against the full vectors (only queries×rerank rows rejoin the
  * fat corpus — the [[AnnPq.topKWith]] shape).
  */
object AnnSq8 {

  /** Per-dimension affine bounds; `flat` = mins ++ scales (scale =
    * (max − min)/255), the layout [[Sq8Ops]] expressions read.
    */
  final case class Bounds(dims: Int, mins: Array[Float], scales: Array[Float]) {
    def flat: Seq[Float] = (mins ++ scales).toSeq
  }

  val Kind = "sq8"

  /** One-pass per-dimension min/max fit. */
  def fit(corpus: DataFrame, vecCol: String): Bounds = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(min("x").as("lo"), max("x").as("hi"))
      .collect()
    require(rows.nonEmpty, "AnnSq8.fit: empty corpus")
    val dims = rows.length
    val mins = new Array[Float](dims)
    val scales = new Array[Float](dims)
    rows.foreach { r =>
      val d = r.getAs[Int]("dim")
      val lo = r.getAs[Float]("lo")
      mins(d) = lo
      scales(d) = (r.getAs[Float]("hi") - lo) / 255f
    }
    Bounds(dims, mins, scales)
  }

  private def boundsLit(b: Bounds) = typedLit(b.flat)

  /** (idCol, code binary[d], anorm) — the reconstruction norm rides
    * with the code so cosine scoring needs no second corpus pass.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, b: Bounds): DataFrame = {
    val code = Sq8Ops.encode(col(vecCol), boundsLit(b))
    df.select(
      col(idCol),
      code.as("code"),
      FloatVec.norm(Sq8Ops.decode(code, boundsLit(b))).as("anorm"))
  }

  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rerank: Int = 0
  ): DataFrame =
    topKWith(queries, corpus, idCol, vecCol, fit(corpus, vecCol), k, rerank)

  /** [[topK]] under prebuilt bounds — the serve path for a persisted
    * index ([[loadIndex]]): no fit pass.
    */
  def topKWith(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      b: Bounds,
      k: Int,
      rerank: Int = 0
  ): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, b).withColumnRenamed(idCol, "nid")
    val qs = queries.select(
      col(idCol).as("qid"),
      col(vecCol).as("qv"),
      FloatVec.norm(col(vecCol)).as("qnorm"))

    val short = math.max(k, rerank)
    val scored = codes
      .crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn(
        "adc_cos",
        Sq8Ops.adcDot(col("qv"), col("code"), boundsLit(b)) / (col("qnorm") * col("anorm")))
    val shortlist = TopK.perKey(scored, Seq("qid"), "adc_cos", "nid", short, carry = Seq("qv"))

    if (rerank <= 0)
      shortlist.select(col("qid"), col("nid"), round(col("adc_cos"), 4).as("cos_sim"))
    else {
      val exact = shortlist
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

  /** Persist bounds as an [[IndexCatalog]] entry (part `bounds`: one row
    * of mins/scales; `dims` in props so serving validates the geometry).
    */
  def saveIndex(spark: SparkSession, b: Bounds, path: String): Unit = {
    import spark.implicits._
    IndexCatalog.write(
      spark,
      path,
      Kind,
      Map("dims" -> b.dims.toString),
      Seq("bounds" -> Seq((b.mins.toSeq, b.scales.toSeq)).toDF("mins", "scales"))
    )
  }

  def loadIndex(spark: SparkSession, path: String): Bounds = {
    val meta = IndexCatalog.open(spark, path, Kind)
    val row = IndexCatalog.part(spark, path, "bounds").head()
    val b = Bounds(
      meta.propInt("dims"),
      row.getSeq[Float](0).toArray,
      row.getSeq[Float](1).toArray)
    require(
      b.mins.length == b.dims && b.scales.length == b.dims,
      s"AnnSq8: bounds geometry ${b.mins.length}/${b.scales.length} != dims ${b.dims}")
    b
  }
}
