package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uplift evaluation — the Qini curve by score decile, the standard
  * readout for "did the model target the persuadables" (incremental
  * response modeling; Radcliffe 2007). Complements [[Causal]]'s effect
  * ESTIMATORS with the targeting-model EVALUATOR.
  *
  * Units rank by score DESCENDING through
  * [[graft.ops.Rank.withGlobalNtile]] (range exchange + broadcast
  * offsets — never a single-partition window over the corpus), reduce
  * to one row per decile, and every cumulative runs over the
  * `buckets`-row aggregate. Qini(k) = R_t(k) − R_c(k)·N_t(k)/N_c(k)
  * (cumulative treated responses minus size-adjusted control
  * responses), with the straight random-targeting line
  * Qini_total·(cum_n/N) beside it — curve above line = the model
  * targets better than chance. All cells integer counts; each emitted
  * rate is one closed form.
  */
object Uplift {

  /** One row per score-descending ntile bucket: n, treated/control
    * counts and responses, their cumulatives, uplift_at_k (treated −
    * control cumulative response-rate gap), qini, and the random
    * baseline. Control-free prefixes yield null qini (size adjustment
    * undefined), the review-flag convention.
    */
  def qiniDeciles(
      df: DataFrame,
      treatedCol: String,
      outcomeCol: String,
      scoreCol: String,
      tieCol: String,
      buckets: Int = 10): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(treatedCol).cast("int").as("t"),
      col(outcomeCol).cast("int").as("y"),
      col(scoreCol).cast("double").as("s"),
      col(tieCol).as("tb"))
    val tiled = graft.ops.Rank.withGlobalNtile(
      base, "bucket", buckets, Seq(col("s").desc, col("tb")))
    val per = tiled.groupBy("bucket").agg(
      count(lit(1)).as("n"),
      sum("t").cast("long").as("nt"),
      sum(lit(1) - col("t")).cast("long").as("nc"),
      sum(col("y") * col("t")).cast("long").as("rt"),
      sum(col("y") * (lit(1) - col("t"))).cast("long").as("rc"))
    // buckets-row frame: corpus-independent windows
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    val cum = per
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_nt", sum("nt").over(w))
      .withColumn("cum_nc", sum("nc").over(w))
      .withColumn("cum_rt", sum("rt").over(w))
      .withColumn("cum_rc", sum("rc").over(w))
      .withColumn("tot_n", sum("n").over(tot))
      .withColumn("tot_nt", sum("nt").over(tot))
      .withColumn("tot_nc", sum("nc").over(tot))
      .withColumn("tot_rt", sum("rt").over(tot))
      .withColumn("tot_rc", sum("rc").over(tot))
    val qini = when(col("cum_nc") > 0,
      q6(col("cum_rt") - col("cum_rc").cast("double") * col("cum_nt") / col("cum_nc")))
    val qiniTotal = col("tot_rt") - col("tot_rc").cast("double") * col("tot_nt") / col("tot_nc")
    cum.select(
      col("bucket"), col("n"), col("nt"), col("nc"), col("rt"), col("rc"),
      col("cum_nt"), col("cum_nc"), col("cum_rt"), col("cum_rc"),
      when(col("cum_nt") > 0 && col("cum_nc") > 0,
        q6(col("cum_rt").cast("double") / col("cum_nt") -
          col("cum_rc").cast("double") / col("cum_nc"))).as("uplift_at_k"),
      qini.as("qini"),
      when(col("tot_nc") > 0,
        q6(qiniTotal * col("cum_n") / col("tot_n"))).as("random_qini"))
  }
}
