package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-hot encoding — Spark-first version of the reference
  * `make_dummies` / `get_all_dummies` (reference: hdfe/hdfe.py:14,35).
  *
  * The reference builds a scipy CSC matrix of indicator columns. On Spark
  * a materialized dummy matrix is an anti-pattern at scale (fixed effects
  * are absorbed instead — see [[graft.ml.FixedEffects]]); `oneHot` exists
  * for the small-cardinality case and emits codegen'd `when/otherwise`
  * indicator columns, one per category, ordered like `np.unique` (sorted
  * ascending). `dropLast` mirrors the reference's `drop_col`.
  *
  * The distinct category list is collected to the driver — by definition
  * one-hot only makes sense for small cardinality; high-cardinality
  * categoricals go through FE absorption instead.
  */
object Dummies {

  /** Hard ceiling on the driver-side category collect: one-hot beyond
    * this is a modeling error (absorb the FE instead), and an ungated
    * `distinct().collect()` on a high-cardinality column would OOM the
    * driver silently long after the job looked healthy.
    */
  val MaxCategories: Int = 10000

  /** Distinct values of `column`, sorted ascending (np.unique order).
    * Fails fast if the cardinality exceeds `maxCategories` — the limit+1
    * probe collects at most maxCategories+1 rows, never the full set.
    */
  def categories(df: DataFrame, column: String, maxCategories: Int = MaxCategories): Seq[String] = {
    val probe = df.select(col(column).cast("string")).distinct().limit(maxCategories + 1).collect()
    require(
      probe.length <= maxCategories,
      s"Dummies.categories('$column'): more than $maxCategories distinct values — " +
        "one-hot encoding at this cardinality would materialize a huge dummy matrix; " +
        "use FixedEffects absorption instead, or raise maxCategories explicitly.")
    probe.map(_.getString(0)).sorted.toSeq
  }

  def oneHot(
      df: DataFrame,
      column: String,
      dropLast: Boolean = false,
      prefix: Option[String] = None,
      values: Option[Seq[String]] = None
  ): DataFrame = {
    val vals0 = values.getOrElse(categories(df, column))
    val vals = if (dropLast) vals0.dropRight(1) else vals0
    val p = prefix.getOrElse(column)
    vals.foldLeft(df) { (acc, v) =>
      acc.withColumn(s"${p}_$v", when(col(column).cast("string") === v, 1).otherwise(0))
    }
  }

  /** All-dummies for several categoricals: first column keeps every
    * category, the rest drop their last (reference: hdfe.py:35-43 keeps
    * the first FE complete and drops one column per additional FE to
    * avoid perfect collinearity).
    */
  def allDummies(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty)
    columns.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      oneHot(acc, c, dropLast = i > 0)
    }
  }

  /** Names the indicator columns that `oneHot` would add. */
  def oneHotNames(df: DataFrame, column: String, dropLast: Boolean = false): Seq[String] = {
    val vals0 = categories(df, column)
    val vals = if (dropLast) vals0.dropRight(1) else vals0
    vals.map(v => s"${column}_$v")
  }
}
