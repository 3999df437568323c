package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVec
import graft.ml.LinAlg

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
  * one-pass aggregate + a driver d×d eigensolve; rotation is d
  * codegen'd [[FloatVec.dot]]s per row — no shuffle, no UDF, and the
  * index build downstream is byte-for-byte the [[AnnPq]] machinery.
  */
object Opq {

  /** Orthonormal rotation: row r of `rows` is the source direction for
    * rotated coordinate r, rows grouped subspace-major (subspace s owns
    * rows s·dsub until (s+1)·dsub). `eigenvalues` follow the same
    * permuted order; `allocation(r)` records which PCA rank landed in
    * slot r (diagnostics / spec).
    */
  final case class Rotation(
      dim: Int,
      m: Int,
      rows: Array[Array[Double]],
      eigenvalues: Array[Double],
      allocation: Array[Int]
  ) {
    /** Rotate an array<float> column: array<float> out, same length. */
    def apply(vecCol: Column): Column =
      array(rows.map(r => FloatVec.dot(vecCol, typedlit(r.map(_.toFloat)))): _*)
        .cast("array<float>")
  }

  /** Fit the rotation for an m-subspace PQ over `vecCol`. */
  def fit(df: DataFrame, vecCol: String, m: Int): Rotation = {
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dims $d not divisible by m=$m")
    val dsub = d / m
    val pca = Pca.fit(df, vecCol, k = d)

    // greedy eigenvalue allocation: λ descending, each to the open
    // subspace with the smallest running log-variance product — the
    // balanced-product heuristic from the OPQ paper's parametric variant
    val filled = new Array[Int](m)
    val logProd = new Array[Double](m)
    val slots = Array.ofDim[Int](m, dsub)
    for (rank <- 0 until d) {
      val s = (0 until m).filter(filled(_) < dsub).minBy(logProd)
      slots(s)(filled(s)) = rank
      filled(s) += 1
      logProd(s) += math.log(math.max(pca.eigenvalues(rank), 1e-300))
    }
    val order = slots.flatten
    Rotation(
      d, m,
      order.map(pca.components),
      order.map(pca.eigenvalues),
      order)
  }

  /** [[AnnPq.topK]] with the learned rotation applied to both sides —
    * same signature, same index machinery, same output contract
    * (cos_sim against ORIGINAL vectors, since the rotation preserves
    * dot products and norms exactly).
    */
  def topK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      kCent: Int = 16,
      rerank: Int = 0,
      sampleN: Int = 2048
  ): DataFrame = {
    val rot = fit(corpus, vecCol, m)
    AnnPq.topK(
      queries.withColumn(vecCol, rot(col(vecCol))),
      corpus.withColumn(vecCol, rot(col(vecCol))),
      idCol, vecCol, k, m, kCent, rerank, sampleN)
  }
}
