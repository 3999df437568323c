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
}
