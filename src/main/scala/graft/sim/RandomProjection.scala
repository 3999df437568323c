package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVec

/** Johnson–Lindenstrauss random projection — cheap dimensionality
  * reduction for the embedding stack: a k×d sign matrix (±1/√k,
  * Achlioptas 2003 — sparse/sign JL needs no Gaussian sampling and
  * preserves pairwise distances with the same guarantee) folded into
  * ONE codegen'd [[graft.functions.FloatMatVec]] per row. Complements
  * [[Pca]]: PCA needs a fit pass and adapts to the data; JL is
  * data-oblivious — zero passes, usable on day one of a crawl, and its
  * distortion bound holds for ANY input.
  *
  * The signs are deterministic from the shared md5-60 hash of
  * "salt:row:col", so the SAME matrix is reproducible on any engine
  * (the q175 oracle rebuilds it in DuckDB SQL) and any cluster size —
  * no broadcast of random state, nothing collected.
  */
object RandomProjection {

  /** Driver-side twin of SharedHash.md5Long60 (first 15 hex chars of
    * md5 as a long) — same value as the Spark column expression and the
    * DuckDB replay for identical input strings.
    */
  private[graft] def md5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  final case class Model(flat: Array[Float], k: Int, dim: Int, salt: String) {
    /** Project an `array<float>` column to k dims — one codegen'd
      * mat-vec, no shuffle, no UDF.
      */
    def project(v: Column): Column = FloatVec.matVec(v, flat, k)
  }

  /** Build the k×d sign matrix: entry (r, j) is ±1/√k by the parity of
    * md5_60("salt:r:j"). k a perfect square keeps 1/√k exactly
    * representable (k = 16 → 0.25f) so the oracle's arithmetic is
    * bit-identical.
    */
  def fit(dim: Int, k: Int, salt: String = "jl"): Model = {
    val scale = (1.0 / math.sqrt(k.toDouble)).toFloat
    val flat = new Array[Float](k * dim)
    var r = 0
    while (r < k) {
      var j = 0
      while (j < dim) {
        flat(r * dim + j) = if (md5Long60(s"$salt:$r:$j") % 2 == 0) scale else -scale
        j += 1
      }
      r += 1
    }
    Model(flat, k, dim, salt)
  }

  /** Long-form projection (id, dim, val) — the replayable shape (the
    * driver's hash-compare can't digest array<float>).
    */
  def projectLong(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol), posexplode(model.project(col(vecCol))).as(Seq("dim", "val")))
}
