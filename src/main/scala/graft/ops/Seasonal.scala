package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition per key (the moving-average
  * method behind `decompose` in every stats package; Kendall & Stuart):
  * value = trend + seasonal + residual, with
  *
  *   - trend: centered moving average of one full period (odd `period`
  *     so the window is symmetric; null at the first/last ⌊m/2⌋ points
  *     — the textbook edge convention, flagged not imputed),
  *   - seasonal: per season-position mean of the detrended series,
  *     re-centered to sum to zero across positions,
  *   - residual: what's left.
  *
  * Scale shape: every window is keyed (`Window.partitionBy(key)`) and
  * the seasonal table is (keys × period) rows joined back broadcast —
  * nothing global, nothing corpus-sized on the driver. The trend MA of
  * integer-valued series is an exact small-integer sum divided by m,
  * identical on any engine; seasonal/residual means carry the usual
  * summation-order ulp noise, so they quantize at 6dp like every other
  * mean in the engine.
  */
object Seasonal {

  /** Adds pos (0-based season position), trend, seasonal, resid.
    * `timeCol` must be a per-key consecutive integer index (gaps are
    * the caller's modeling decision, as with [[Lags]]).
    */
  def decompose(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3 for a centered MA, got $period")
    val half = period / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(-half, half)
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val v = col(valueCol).cast("double")
    val based = df
      .withColumn("pos", pmod(col(timeCol).cast("long"), lit(period.toLong)))
      // exact integer-ish MA: sum over the full frame / m, null at edges
      .withColumn("trend",
        when(count(v).over(w) === period, sum(v).over(w) / lit(period.toDouble)))
      .withColumn("__det", v - col("trend"))
    val seasonal = based
      .where(col("__det").isNotNull)
      .groupBy(col(keyCol), col("pos"))
      .agg(avg(col("__det")).as("__smean"))
    // re-center so the seasonal component sums to zero per key
    val centered = seasonal
      .withColumn("seasonal",
        col("__smean") - avg(col("__smean")).over(Window.partitionBy(col(keyCol))))
      .drop("__smean")
    based
      .join(broadcast(centered), Seq(keyCol, "pos"), "left")
      .withColumn("resid",
        when(col("trend").isNotNull && col("seasonal").isNotNull,
          v - col("trend") - col("seasonal")))
      .withColumn("trend", q6(col("trend")))
      .withColumn("seasonal", q6(col("seasonal")))
      .withColumn("resid", q6(col("resid")))
      .drop("__det")
  }
}
