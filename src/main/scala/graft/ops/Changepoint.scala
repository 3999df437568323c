package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tabular CUSUM changepoint detection (Page 1954) per key — the
  * sequential mean-shift alarm beside [[Ewma]]'s smoother and
  * [[Drift]]'s two-sample tests: C⁺ accumulates positive deviations
  * beyond an allowance k, C⁻ negative ones, and an alarm fires when
  * either exceeds the decision limit h (both in units of the key's
  * own scale).
  *
  * The textbook recursion C⁺ᵢ = max(0, C⁺ᵢ₋₁ + xᵢ − μ − k) is not a
  * window aggregate — but it IS the prefix identity
  * C⁺ᵢ = Sᵢ − min(0, min_{j≤i} Sⱼ) with Sᵢ the running sum of
  * (x − μ − k) and the 0 term the EMPTY-prefix anchor (S₀ = 0 — drop
  * it and the first accumulating row reads 0), so the whole detector
  * is two cumulative windows per key (running sum +
  * running min), exactly replayable: cumulative ROWS frames evaluate
  * sequentially in both engines, so the doubles match bit-for-bit.
  * μ and σ come from one per-key aggregate broadcast back. All windows
  * shard by key — nothing global, the [[Grouped.rolling]] shape.
  */
object Changepoint {

  /** Adds cusum_pos, cusum_neg (6dp) and alarm (0/1) per row.
    * `kSigma`/`hSigma` are the allowance and decision limit in σ units
    * (0.5 / 4–5 are the textbook defaults). Degenerate keys (σ = 0)
    * never alarm.
    */
  def cusum(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      kSigma: Double = 0.5,
      hSigma: Double = 4.0): DataFrame = {
    // explicit-moment σ, not stddev_pop: for integer-valued series the
    // two moment sums are EXACT doubles (< 2^53) in any summation order,
    // so μ and σ are bit-identical on every engine — stddev_pop's
    // streaming central-moment updates are not. (Contract: values far
    // from 2^26-scale magnitudes; corpus counts qualify.)
    val vagg = col(valueCol).cast("double")
    val stats = df
      .groupBy(col(keyCol))
      .agg(
        avg(vagg).as("__mu"),
        sqrt(greatest(lit(0.0), avg(vagg * vagg) - avg(vagg) * avg(vagg))).as("__sigma"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast("double")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val sPos = sum(v - col("__mu") - lit(kSigma) * col("__sigma")).over(w)
    val sNeg = sum(v - col("__mu") + lit(kSigma) * col("__sigma")).over(w)
    df.join(broadcast(stats), Seq(keyCol))
      .withColumn("__sp", sPos)
      .withColumn("__sn", sNeg)
      .withColumn("cusum_pos",
        q6(col("__sp") - least(lit(0.0), min(col("__sp")).over(w))))
      .withColumn("cusum_neg",
        q6(greatest(lit(0.0), max(col("__sn")).over(w)) - col("__sn")))
      .withColumn("alarm",
        when(col("__sigma") > 0 &&
          (col("cusum_pos") > lit(hSigma) * col("__sigma") ||
            col("cusum_neg") > lit(hSigma) * col("__sigma")), 1L).otherwise(0L))
      .drop("__mu", "__sp", "__sn")
      .withColumn("__sigma", q6(col("__sigma")))
      .withColumnRenamed("__sigma", "sigma")
  }

  /** Page–Hinkley drift detector per key — [[cusum]]'s self-calibrating
    * sibling: no baseline pass; the reference level is the RUNNING mean
    * x̄ᵢ, so the detector adapts online (the streaming-drift-literature
    * default for data-quality monitors). Two-sided: mᵢ = Σ(xⱼ − x̄ⱼ − δ)
    * resets against its historical minimum (increase alarm when
    * mᵢ − min m > λ), and the mirrored sum against its minimum for
    * decreases. All four series are prefix windows over the SAME keyed
    * (time, tie) sort — one shuffle, four window columns, corpus rows
    * sharded by key. The alarm compares the 1e-4-quantized statistic
    * (both engines), so replay cannot flip at a float boundary.
    * [[graft.streaming.EventStream.pageHinkleyStream]] is the live
    * fold of the identical recursion.
    */
  def pageHinkley(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String,
      delta: Double,
      lambda: Double): DataFrame = {
    require(lambda > 0, "Changepoint.pageHinkley: lambda must be positive")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast("double")
    // cumulative sum ÷ cumulative count, NOT avg().over(w): cumulative
    // ROWS sums evaluate sequentially in both engines (the cusum
    // bit-parity finding), while windowed AVG's internal accumulation is
    // engine-specific — with 2-decimal inputs the early-prefix PH values
    // sit EXACTLY on k/200 grid points, so any non-bit-identical mean
    // flips floor-quantizer midpoints (observed at 1e-4 and 1e-6 both)
    val runMean = sum(v).over(w) / count(lit(1)).over(w)
    df
      .withColumn("__dev", v - runMean)
      .withColumn("__mu_up", sum(col("__dev") - lit(delta)).over(w))
      .withColumn("__mu_dn", sum(-col("__dev") - lit(delta)).over(w))
      .withColumn("ph_up", q6(col("__mu_up") - min(col("__mu_up")).over(w)))
      .withColumn("ph_dn", q6(col("__mu_dn") - min(col("__mu_dn")).over(w)))
      .withColumn("alarm",
        when(col("ph_up") > lambda || col("ph_dn") > lambda, 1L).otherwise(0L))
      .drop("__dev", "__mu_up", "__mu_dn")
  }
}
