package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Covariance-aware embedding outlier scoring — Mahalanobis distance in
  * the top-k principal subspace: d² = Σ_r y_r² over the WHITENED PCA
  * coordinates y = Λ^(−1/2)Vᵀ(x−μ). This is exactly the quadratic form
  * (x−μ)ᵀΣ_k⁻¹(x−μ), so direction matters: a point 3σ out along a
  * thin (low-variance) direction scores high while a same-NORM point
  * along the corpus's fat axis does not — the failure mode per-dim
  * z-scoring ([[Embed.standardizer]]) cannot see, and the reason this
  * operator exists beside it. Under Gaussianity d² ~ χ²(k), so
  * thresholds come from chi-square quantiles.
  *
  * Scale shape: the fit is [[Pca.fit]]'s ONE VecOuterAgg pass; scoring
  * is row-local codegen (k float-dots + offsets folded as literals) —
  * no shuffle, no UDF, nothing collected beyond the d×d moment buffer.
  */
object Outliers {

  /** (idCol, m2 = squared Mahalanobis distance in the top-k subspace
    * rounded to 3dp, outlier flag on the unrounded score).
    */
  def pcaMahalanobis(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: PcaModel,
      threshold: Double
  ): DataFrame = {
    val y = model.transform(col(vecCol), whiten = true)
    df.select(col(idCol), y.as("__y"))
      .withColumn("__m2", aggregate(col("__y"), lit(0.0), (acc, x) => acc + x * x))
      .select(
        col(idCol),
        round(col("__m2"), 3).as("m2"),
        (col("__m2") > threshold).cast("int").as("outlier"))
  }

  /** Driver-side reference for specs: the same quadratic form from the
    * model's arrays.
    */
  private[graft] def referenceM2(model: PcaModel, v: Array[Float]): Double = {
    var d2 = 0.0
    var r = 0
    while (r < model.components.length) {
      val c = model.components(r)
      var dot = 0.0
      var i = 0
      // mirror the engine: components are folded as FLOATS, the offset
      // in full double
      while (i < c.length) { dot += c(i).toFloat.toDouble * v(i).toDouble; i += 1 }
      var off = 0.0
      i = 0
      while (i < c.length) { off += c(i) * model.mean(i); i += 1 }
      val yr = (dot - off) / math.sqrt(math.max(model.eigenvalues(r), 1e-300))
      d2 += yr * yr
      r += 1
    }
    d2
  }
}
