package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — right-censored time-to-event, the
  * nonparametric companion to the [[Glm.Cloglog]] discrete-time-hazard
  * GLM: S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times, where
  * nᵢ is the at-risk count (everyone with duration ≥ tᵢ) and dᵢ the
  * events at tᵢ. Censored subjects leave the risk set without
  * contributing an event — dropping them instead (the naive mistake)
  * biases survival DOWN.
  *
  * Scale shape: the corpus collapses to one (duration) count aggregate
  * (events, censored); the risk set is a SUFFIX sum and the product a
  * prefix sum of ln(1 − d/n), both windows over the DISTINCT-duration
  * frame — duration-cardinality rows, never corpus rows (the
  * [[graft.ops.Drift]] honest-cost argument).
  */
object Survival {

  /** (t, n_risk, d_events, n_censored, survival) per distinct duration,
    * survival 6dp, ordered by t.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        sum(lit(1) - col(eventCol).cast("int")).cast("long").as("c"))

    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    counts
      .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn(
        "ln_term",
        // the 1e-300 floor keeps ln finite when d = n_risk (everyone at
        // the last time dies): survival rounds to exactly 0 on both
        // engines instead of tripping ln(0)
        when(col("d") > 0,
          log(greatest(
            lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"),
            lit(1e-300))))
          .otherwise(lit(0.0)))
      .withColumn("survival", round(exp(sum(col("ln_term")).over(wAsc)), 6))
      .select(
        col("t"), col("n_risk"), col("d").as("d_events"), col("c").as("n_censored"),
        col("survival"))
      .orderBy(col("t"))
  }
}
