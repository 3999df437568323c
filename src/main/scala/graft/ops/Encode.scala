package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Leakage-safe categorical target encoding — each row's category gets
  * the target mean computed from the OTHER folds only (the standard
  * K-fold trick that keeps a high-cardinality feature from memorizing
  * its own label). Folds come from the shared md5-60 hash of
  * (salt, id) — deterministic on any cluster size, SQL-replayable, and
  * stable when the corpus grows ([[Sampling.bucket]] contract).
  *
  * Mechanics: one (category × fold) count/sum aggregate (cell-sized,
  * never corpus-sized), category totals fold from the cells, and the
  * out-of-fold mean is (Σ_cat − Σ_cell)/(n_cat − n_cell) joined back by
  * (category, fold) — a keyed join, no window. Categories seen ONLY in
  * the row's own fold fall back to the GLOBAL out-of-fold mean
  * (computed the same leave-fold-out way — still leak-free), flagged
  * via `te_fallback`.
  */
object Encode {

  def targetOof(
      df: DataFrame,
      idCol: String,
      catCol: String,
      targetCol: String,
      folds: Int = 5,
      salt: String = "graft"): DataFrame = {
    require(folds >= 2, "targetOof: need at least 2 folds")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val withFold = df.withColumn("fold",
      pmod(SharedHash.md5Long60(
        concat(lit(salt), lit(":"), col(idCol).cast("string"))), lit(folds.toLong))
        .cast("int"))
    val cells = withFold
      .groupBy(col(catCol).as("__c"), col("fold"))
      .agg(count(lit(1)).as("__nf"), sum(col(targetCol).cast("double")).as("__sf"))
      .localCheckpoint(true)
    val perCat = cells.groupBy("__c")
      .agg(sum("__nf").as("__nc"), sum("__sf").as("__sc"))
    val perFold = cells.groupBy("fold")
      .agg(sum("__nf").as("__nfg"), sum("__sf").as("__sfg"))
    val tot = cells.agg(sum("__nf").as("__nt"), sum("__sf").as("__st"))
    val oof = cells
      .join(perCat, Seq("__c"))
      .join(perFold, Seq("fold"))
      .crossJoin(broadcast(tot))
      .select(
        col("__c"), col("fold"),
        when(col("__nc") > col("__nf"),
          (col("__sc") - col("__sf")) / (col("__nc") - col("__nf")).cast("double"))
          .as("__te_cat"),
        when(col("__nt") > col("__nfg"),
          (col("__st") - col("__sfg")) / (col("__nt") - col("__nfg")).cast("double"))
          .as("__te_glob"))
    withFold
      .join(oof, col(catCol) === col("__c") && withFold("fold") === oof("fold"))
      .drop(oof("fold")).drop("__c")
      .withColumn("te", q6(coalesce(col("__te_cat"), col("__te_glob"))))
      .withColumn("te_fallback", col("__te_cat").isNull)
      .drop("__te_cat", "__te_glob")
  }
}
