package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group OLS: an independent y ~ xs fit inside every group — the
  * "estimate per entity" pattern (per-firm betas, per-cohort trends)
  * that a reference user runs with groupby-apply over a fitting
  * function.
  *
  * Fully distributed in G: ONE groupBy pass aggregates each group's
  * Gram statistics (k(k+1)/2 + k sums, map-side combined), then the
  * k×k solve runs per GROUP ROW via a Scala UDF — G solves spread
  * across the cluster, never collected. The UDF is justified here
  * (SURVEY §3 tier): it runs once per group on k² doubles, not once
  * per fact row, so codegen pressure is irrelevant; the data-sized
  * work is all in the codegen'd aggregate.
  */
object GroupedOls {

  /** One row per group: group cols, `n`, and `b_0..b_k` (intercept
    * first when `intercept`). Groups whose Gram matrix is singular
    * (fewer rows than columns, constant x) yield null coefficients.
    */
  def fitPerGroup(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      groups: Seq[String],
      intercept: Boolean = true
  ): DataFrame = {
    val cols = (if (intercept) Seq(lit(1.0)) else Nil) ++ xs.map(c => col(c).cast("double"))
    val yc = col(y).cast("double")
    val k = cols.length

    val gramAggs =
      (for (i <- 0 until k; j <- i until k) yield sum(cols(i) * cols(j)).as(s"g_${i}_$j")) ++
        (0 until k).map(i => sum(cols(i) * yc).as(s"c_$i")) :+ count(lit(1)).as("n")
    val grams = df.groupBy(groups.map(col): _*).agg(gramAggs.head, gramAggs.tail: _*)

    val solve = udf { (gFlat: Seq[Double], c: Seq[Double]) =>
      val kk = c.length
      val g = Array.ofDim[Double](kk, kk)
      var p = 0
      for (i <- 0 until kk; j <- i until kk) {
        g(i)(j) = gFlat(p); g(j)(i) = gFlat(p); p += 1
      }
      try Some(LinAlg.solve(g, c.toArray).toSeq)
      catch { case _: Exception => None }
    }

    val gArr = array((for (i <- 0 until k; j <- i until k) yield col(s"g_${i}_$j")): _*)
    val cArr = array((0 until k).map(i => col(s"c_$i")): _*)
    val solved = grams.withColumn("__b", solve(gArr, cArr))
    val names =
      (if (intercept) Seq("b_intercept") else Nil) ++ xs.map(x => s"b_$x")
    names.zipWithIndex
      .foldLeft(solved) { case (acc, (nm, i)) => acc.withColumn(nm, col("__b").getItem(i)) }
      .select((groups.map(col) :+ col("n")) ++ names.map(col): _*)
  }
}
