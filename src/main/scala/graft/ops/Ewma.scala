package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per key — the classic
  * telemetry smoother (s_1 = x_1; s_i = α·x_i + (1−α)·s_{i−1}) plus the
  * spike flag against the PREVIOUS smoothed level (the one-step-ahead
  * forecast residual, so the spike itself doesn't suppress its own
  * detection).
  *
  * The recurrence is inherently sequential per key, so it runs as a
  * per-key sorted fold: one groupBy collects each key's series in event
  * order, a codegen'd `aggregate` higher-order function replays the
  * recurrence left-to-right in IEEE order, and posexplode restores one
  * row per event. Per-key series are bounded (telemetry keys see
  * thousands of events, not billions); keys themselves shard across the
  * cluster on the groupBy hash, so the fold parallelizes across keys.
  * α and (1−α) are shipped into BOTH engines as the same binary64
  * literals (Double.toString), and DuckDB replays the identical
  * recurrence with a recursive CTE — the fold is bit-exact across
  * engines before the output rounding.
  */
object Ewma {

  /** Per-key EWMA over `valueCol` in (`tsCol`, `tieCol`) order, with the
    * one-step forecast residual and a spike flag at `|resid| > delta`.
    * Output: key, tie, value, ewma (6dp), resid (6dp, null on each
    * key's first row), spike.
    */
  def smooth(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      alpha: Double,
      delta: Double): DataFrame = {
    val a = alpha.toString
    val b = (1.0 - alpha).toString
    val series = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"), col(tieCol).as("k"), col(valueCol).cast("double").as("v")))).as("xs"))
      .withColumn(
        "ss",
        expr(
          s"""aggregate(xs, cast(array() as array<double>),
             |  (acc, e) -> array_append(acc,
             |    case when size(acc) = 0 then e.v
             |         else $a * e.v + $b * element_at(acc, -1) end))""".stripMargin))
    val rows = series
      .select(col(keyCol), posexplode(arrays_zip(col("xs"), col("ss"))))
      .select(
        col(keyCol),
        col("pos").as("_pos"),
        col("col.xs.k").as(tieCol),
        col("col.xs.v").as(valueCol),
        col("col.ss").as("_s"))
    // lag must follow the FOLD's order (ts, tie), which is the explode
    // position — not the tie column alone
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_pos"))
    val resid = col(valueCol) - lag(col("_s"), 1).over(w)
    // chain outputs sit ulp-close to 6dp midpoints often enough that
    // round()'s engines diverge (Spark: decimal-exact HALF_UP; DuckDB:
    // scaled-double); quantize with explicit IEEE ops instead — both
    // engines compute floor(x·1e6 + 0.5)/1e6 bit-identically
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    rows
      .withColumn("ewma", q6(col("_s")))
      .withColumn("resid", q6(resid))
      .withColumn("spike", coalesce(abs(resid) > delta, lit(false)))
      .drop("_s", "_pos")
  }
}
