package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Multicollinearity detection — Spark-first version of the reference
  * `find_collinear_cols` / `remove_collinear_cols`
  * (reference: hdfe/multicollinearity.py:50,111).
  *
  * The reference QR-decomposes X (n×k) in memory. At 100 TB only the k×k
  * Gram matrix can reach the driver, so graft aggregates X'X in one
  * codegen'd pass and runs the same left-to-right rank-revealing column
  * walk on the Gram factor ([[LinAlg.collinearFromGram]]). Semantics
  * match: the returned set is a minimal set of columns whose removal
  * makes X full rank, preferring to keep leftmost columns — identical to
  * the reference's QR column scan.
  */
object Collinearity {

  /** Gram matrix X'X of `xs` in one aggregation pass. */
  def gram(df: DataFrame, xs: Seq[String]): Array[Array[Double]] = {
    val k = xs.length
    val cols = xs.map(c => col(c).cast("double"))
    val aggs = for (i <- 0 until k; j <- i until k) yield sum(cols(i) * cols(j)).as(s"g_${i}_$j")
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val g = Array.ofDim[Double](k, k)
    var p = 0
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      g(i)(j) = v; g(j)(i) = v
    }
    g
  }

  /** (collinear column names, kept column names). */
  def findCollinear(df: DataFrame, xs: Seq[String], tol: Double = 1e-7): (Seq[String], Seq[String]) = {
    val (dropped, kept) = LinAlg.collinearFromGram(gram(df, xs), tol)
    (dropped.map(xs), kept.map(xs))
  }

  /** Project away a minimal set of collinear columns
    * (reference: remove_collinear_cols).
    */
  def removeCollinear(df: DataFrame, xs: Seq[String], tol: Double = 1e-7): DataFrame = {
    val (droppedNames, _) = findCollinear(df, xs, tol)
    df.drop(droppedNames: _*)
  }

  /** Variance inflation factors — VIF_j = [R⁻¹]_jj over the CORRELATION
    * matrix R of `xs` (≡ 1/(1−R²_j) of each column on the rest): the
    * graded dial where [[findCollinear]] is the binary alarm. One
    * (k+1)(k+2)/2-moment aggregate pass (means + Gram — corpus never
    * moves), then a k×k driver-side standardize + invert. Returns one
    * row per covariate: covariate, vif (6dp), r2_others (6dp);
    * zero-variance columns get null VIF (flagged, not crashed).
    */
  def vif(df: DataFrame, xs: Seq[String]): DataFrame = {
    val k = xs.length
    require(k >= 2, "vif: need at least two covariates")
    val cols = xs.map(c => col(c).cast("double"))
    val aggs = Seq(count(lit(1)).as("n")) ++
      xs.indices.map(i => sum(cols(i)).as(s"s_$i")) ++
      (for (i <- 0 until k; j <- i until k) yield sum(cols(i) * cols(j)).as(s"g_${i}_$j"))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getLong(0).toDouble
    val s = Array.tabulate(k)(i => row.getDouble(1 + i))
    val g = Array.ofDim[Double](k, k)
    var p = 1 + k
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      g(i)(j) = v; g(j)(i) = v
    }
    // centered covariance → correlation; zero-variance columns flagged
    val d = Array.tabulate(k)(i => g(i)(i) - s(i) * s(i) / n)
    val live = (0 until k).filter(d(_) > 0)
    val corr = Array.tabulate(live.length, live.length) { (a, b) =>
      val (i, j) = (live(a), live(b))
      (g(i)(j) - s(i) * s(j) / n) / math.sqrt(d(i) * d(j))
    }
    val inv =
      try Some(LinAlg.inverse(corr)) catch { case _: Exception => None }
    def q6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val out: Seq[(String, Option[Double], Option[Double])] =
      xs.zipWithIndex.map { case (name, i) =>
        val a = live.indexOf(i)
        val v: Option[Double] = if (a < 0) None else inv.map(_(a)(a))
        (name, v.map(q6d), v.map(x => q6d(1.0 - 1.0 / x)))
      }
    val spark = df.sparkSession
    import spark.implicits._
    out.toDF("covariate", "vif", "r2_others")
  }
}
