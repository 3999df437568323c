package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.FloatVec
import graft.sources.IndexCatalog

/** Optimized product quantization, parametric variant (Ge et al. 2014):
  * rotate vectors into the PCA eigenbasis and PERMUTE the rotated
  * dimensions so each PQ subspace receives an equal share of the
  * variance (greedy eigenvalue allocation balancing per-subspace
  * log-variance products). Plain [[AnnPq]] splits raw dimensions
  * blindly — an anisotropic corpus then concentrates its energy in a
  * few subspaces whose k centroids can't cover it, and recall
  * collapses; the rotation spreads the fat directions one-per-subspace.
  *
  * The applied transform is the PURE orthonormal rotation (no mean
  * subtraction): dot products and norms are preserved exactly, so ADC
  * cosine scores against rotated codes estimate the ORIGINAL cosine —
  * centering would break that equivalence (PCA's centered covariance is
  * used only to ESTIMATE the directions). Fit cost is [[Pca.fit]]'s
  * one-pass aggregate + a driver d×d eigensolve; rotation is ONE
  * codegen'd [[graft.functions.FloatMatVec]] per row (the d separate
  * dot expressions it replaces were a Janino-sized codegen tree at
  * d = 64) — no shuffle, no UDF, and the index build downstream is
  * byte-for-byte the [[AnnPq]] machinery.
  *
  * Index STATE (rotation + codebook) persists through
  * [[IndexCatalog]] ([[saveIndex]]/[[loadIndex]]): train once on the
  * full corpus, then any session searches with [[topKWith]] — without
  * it, every serving session would pay the fit and, worse, a RE-trained
  * rotation would score codes encoded under the old one as garbage
  * (the [[AnnIvfPq.saveIndex]] rationale).
  */
object Opq {

  /** Orthonormal rotation: row r of `rows` is the source direction for
    * rotated coordinate r, rows grouped subspace-major (subspace s owns
    * rows s·dsub until (s+1)·dsub). `eigenvalues` follow the same
    * permuted order; `allocation(r)` records which PCA rank landed in
    * slot r (diagnostics / spec / persistence).
    */
  final case class Rotation(
      dim: Int,
      m: Int,
      rows: Array[Array[Double]],
      eigenvalues: Array[Double],
      allocation: Array[Int]
  ) {
    private lazy val flat: Array[Float] = {
      val out = new Array[Float](dim * dim)
      var r = 0
      while (r < rows.length) {
        var j = 0
        while (j < dim) { out(r * dim + j) = rows(r)(j).toFloat; j += 1 }
        r += 1
      }
      out
    }

    /** Rotate an array<float> column: array<float> out, same length. */
    def apply(vecCol: Column): Column = FloatVec.matVec(vecCol, flat, dim)
  }

  /** Fit the rotation for an m-subspace PQ over `vecCol` of `dims`
    * floats (dims passed by the caller — index builds know their
    * embedding width; probing it with a limit-1 job mid-API is the §8
    * metadata-as-parameters anti-pattern).
    */
  def fit(df: DataFrame, vecCol: String, m: Int, dims: Int): Rotation = {
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    val pca = Pca.fit(df, vecCol, k = dims)
    require(pca.dim == dims, s"vectors are ${pca.dim}-dim, caller said $dims")

    // greedy eigenvalue allocation: λ descending, each to the open
    // subspace with the smallest running log-variance product — the
    // balanced-product heuristic from the OPQ paper's parametric variant
    val filled = new Array[Int](m)
    val logProd = new Array[Double](m)
    val slots = Array.ofDim[Int](m, dsub)
    for (rank <- 0 until dims) {
      val s = (0 until m).filter(filled(_) < dsub).minBy(logProd)
      slots(s)(filled(s)) = rank
      filled(s) += 1
      logProd(s) += math.log(math.max(pca.eigenvalues(rank), 1e-300))
    }
    val order = slots.flatten
    Rotation(
      dims, m,
      order.map(pca.components),
      order.map(pca.eigenvalues),
      order)
  }

  /** The full searchable state: rotation + the PQ codebook trained on
    * the ROTATED corpus. Driver-bounded (d² + m·k·dsub floats).
    */
  final case class Index(rot: Rotation, cb: AnnPq.Codebook)

  /** Train rotation + codebook — build once, then [[topKWith]] (or
    * [[saveIndex]] and serve from any session).
    */
  def build(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int = 8,
      kCent: Int = 16,
      sampleN: Int = 2048
  ): Index = {
    val rot = fit(corpus, vecCol, m, dims)
    val cb = AnnPq.train(
      corpus.withColumn(vecCol, rot(col(vecCol))), idCol, vecCol, m, kCent, sampleN)
    Index(rot, cb)
  }

  /** [[AnnPq.topKWith]] under a prebuilt rotation+codebook — the
    * serve path: no fit, no train, just rotate-encode-scan. Output
    * contract unchanged (cos_sim against ORIGINAL vectors: the
    * rotation preserves dot products and norms exactly).
    */
  def topKWith(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      index: Index,
      k: Int,
      rerank: Int = 0
  ): DataFrame =
    AnnPq.topKWith(
      queries.withColumn(vecCol, index.rot(col(vecCol))),
      corpus.withColumn(vecCol, index.rot(col(vecCol))),
      idCol, vecCol, index.cb, k, rerank)

  /** Build + search in one call ([[AnnPq.topK]] with the learned
    * rotation applied to both sides — same output contract).
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      k: Int,
      m: Int = 8,
      kCent: Int = 16,
      rerank: Int = 0,
      sampleN: Int = 2048
  ): DataFrame =
    topKWith(
      queries, corpus, idCol, vecCol,
      build(corpus, idCol, vecCol, dims, m, kCent, sampleN), k, rerank)

  private val Kind = "opq"

  /** Persist the index state as an [[IndexCatalog]] entry: `rotation`
    * part (one row per rotated coordinate: slot, source direction,
    * eigenvalue, PCA-rank allocation) + `codebook` part (the
    * [[AnnPq.Codebook]] flat layout, identical to [[AnnIvfPq]]'s).
    */
  def saveIndex(spark: SparkSession, index: Index, path: String): Unit = {
    import spark.implicits._
    val rot = index.rot
    val rotDf = rot.rows.indices
      .map(r => (r, rot.rows(r).toSeq, rot.eigenvalues(r), rot.allocation(r)))
      .toDF("slot", "row", "eigenvalue", "allocation")
    val cbDf = Seq((index.cb.m, index.cb.k, index.cb.dsub, index.cb.flat.toSeq))
      .toDF("m", "k", "dsub", "flat")
    IndexCatalog.write(
      spark, path, Kind,
      Map("dim" -> rot.dim.toString, "m" -> rot.m.toString),
      Seq("rotation" -> rotDf, "codebook" -> cbDf))
  }

  def loadIndex(spark: SparkSession, path: String): Index = {
    val meta = IndexCatalog.open(spark, path, Kind)
    val rotRows = IndexCatalog.part(spark, path, "rotation")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2), r.getInt(3)))
      .sortBy(_._1)
    val cb = IndexCatalog.part(spark, path, "codebook").head()
    Index(
      Rotation(
        meta.propInt("dim"), meta.propInt("m"),
        rotRows.map(_._2), rotRows.map(_._3), rotRows.map(_._4)),
      AnnPq.Codebook(cb.getInt(0), cb.getInt(1), cb.getInt(2), cb.getSeq[Float](3).toArray))
  }
}
