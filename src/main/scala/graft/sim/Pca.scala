package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, VecOuterAgg}
import graft.ml.LinAlg

/** PCA / whitening over an embedding column — the standard
  * preprocessing in front of semantic dedup and ANN retrieval (decorrelate
  * and rescale so cosine/L2 geometry isn't dominated by a few fat
  * directions; cf. Jégou–Chum 2012 on whitening for image retrieval).
  *
  * Scale shape (100 TB): [[fit]] is ONE map-side-combined aggregate pass
  * — [[VecOuterAgg]] ships a (1 + d + d(d+1)/2)-double partial (~16 KB at
  * d = 64) per partition, never a row — and the d×d eigendecomposition
  * runs on the driver ([[LinAlg.symEigen]]). [[PcaModel.transform]] is
  * row-local codegen: each output coordinate is one [[FloatVec.dot]]
  * against a broadcast-literal component minus a precomputed scalar
  * (mean-centering folds into the offset: (v−μ)·c = v·c − μ·c), so
  * projection adds NO shuffle and no UDF.
  */
case class PcaModel(
    dim: Int,
    n: Long,
    mean: Array[Double],
    eigenvalues: Array[Double],          // top-k, descending
    components: Array[Array[Double]],    // k rows, unit-norm, sign-fixed
    totalVariance: Double                // trace of the covariance
) {
  def varianceExplained: Array[Double] = eigenvalues.map(_ / totalVariance)

  /** Project `vecCol` (array<float>) onto the k components; `whiten`
    * divides each coordinate by √λ so the output has unit variance per
    * component. Output: array<double> of length k.
    */
  def transform(vecCol: Column, whiten: Boolean = false): Column = {
    val coords = components.zip(eigenvalues).map { case (c, lam) =>
      val cf = typedlit(c.map(_.toFloat))
      val offset = c.zip(mean).map { case (ci, mi) => ci * mi }.sum
      val proj = FloatVec.dot(vecCol, cf) - lit(offset)
      if (whiten) proj / math.sqrt(math.max(lam, 1e-300)) else proj
    }
    array(coords: _*)
  }
}

object Pca {

  /** Fit a k-component PCA of the float vectors in `vecCol`: one
    * distributed pass for (n, Σv, Σvvᵀ), covariance with the n−1
    * convention on the driver, Jacobi eigensolve, top-k kept.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val flat = df
      .agg(VecOuterAgg.vecOuter(col(vecCol)))
      .head().getSeq[Double](0).toArray
    require(flat.nonEmpty, "PCA fit over an empty frame")
    // solve 1 + d + d(d+1)/2 = len for d
    val d = ((math.sqrt(9.0 + 8.0 * (flat.length - 1)) - 3.0) / 2.0).round.toInt
    require(1 + d + d * (d + 1) / 2 == flat.length, s"bad buffer length ${flat.length}")
    val n = math.round(flat(0))
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")

    val mean = Array.tabulate(d)(i => flat(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var p = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (flat(p) - n * mean(i) * mean(j)) / (n - 1.0)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    val total = (0 until d).map(ii => cov(ii)(ii)).sum
    val (values, vectors) = LinAlg.symEigen(cov)
    PcaModel(d, n, mean, values.take(k), vectors.take(k), total)
  }

  /** Persist a fitted model (one [[graft.sources.IndexCatalog]] entry,
    * kind `pca`): `components` part (rank, direction, eigenvalue) +
    * `center` part (the mean vector). Scalars ride in props —
    * `Double.toString` round-trips exactly, so the reloaded transform
    * is bit-identical to the fitted one.
    */
  def saveModel(spark: org.apache.spark.sql.SparkSession, m: PcaModel, path: String): Unit = {
    import spark.implicits._
    graft.sources.IndexCatalog.write(
      spark, path, "pca",
      Map(
        "dim" -> m.dim.toString, "n" -> m.n.toString,
        "total_variance" -> m.totalVariance.toString),
      Seq(
        "components" -> m.components.indices
          .map(r => (r, m.components(r).toSeq, m.eigenvalues(r)))
          .toDF("rank", "component", "eigenvalue"),
        "center" -> Seq(Tuple1(m.mean.toSeq)).toDF("mean")))
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): PcaModel = {
    val meta = graft.sources.IndexCatalog.open(spark, path, "pca")
    val comps = graft.sources.IndexCatalog.part(spark, path, "components")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val mean = graft.sources.IndexCatalog.part(spark, path, "center")
      .head().getSeq[Double](0).toArray
    PcaModel(
      meta.propInt("dim"), meta.prop("n").toLong, mean,
      comps.map(_._3), comps.map(_._2), meta.prop("total_variance").toDouble)
  }
}
