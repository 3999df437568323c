package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — "which channel gets credit for the
  * conversion" across the five standard models in one pass: linear
  * (1/k), time-decay (exponential half-life, normalized per
  * conversion), position-based (40/20/40 U-shape), last-touch and
  * first-touch. The credit table is the marketing-mix counterpart of
  * the funnel ([[Funnel]]) and transition ([[Transitions]]) readouts.
  *
  * Scale shape: conversions join touches on the USER key (equi-join;
  * the time filter rides on top), so the shuffle is keyed by user and
  * the per-conversion windows are keyed by conversion id — per-user /
  * per-conversion cardinalities are bounded by the lookback window,
  * never corpus-sized, and nothing sorts globally. Timestamps compare
  * as integer microseconds (`unix_micros` ≡ DuckDB `epoch_us` — no
  * second-truncation drift); every weight is a closed form the oracle
  * replays, quantized 6dp only at the emitted sums.
  */
object Attribution {

  /** Per-channel credit under all five models.
    *
    * A touch attributes to a conversion of the same user when
    * `0 ≤ t_conv − t_touch ≤ lookbackSec` (a same-microsecond touch
    * counts — it is upstream-or-simultaneous, and the conversion event
    * type itself is never a touch type). Ties inside a conversion
    * break by (timestamp, touch id): the earliest touch is "first",
    * the latest "last"; with k = 1 the single touch is both. The
    * position model pays 0.4/0.4 to first/last and splits 0.2 over the
    * middle (k = 1 → 1.0, k = 2 → 0.5/0.5 — the degenerate
    * conventions made explicit).
    *
    * Returns one row per channel: `touches` (attributed touch rows),
    * `conversions` (distinct conversions the channel touched), and
    * `credit_linear/decay/position/last/first` (6dp).
    */
  def credit(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      idCol: String,
      conversionType: String,
      touchTypes: Seq[String],
      lookbackSec: Long,
      halfLifeSec: Double): DataFrame = {
    require(!touchTypes.contains(conversionType),
      "Attribution.credit: the conversion type cannot also be a touch type")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val lookbackUs = lookbackSec * 1000000L
    val halfLifeUs = halfLifeSec * 1e6

    val conv = events
      .where(col(typeCol) === conversionType)
      .select(
        col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__cts"),
        col(idCol).as("__cid"))
    val touch = events
      .where(col(typeCol).isin(touchTypes: _*))
      .select(
        col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("__tts"),
        col(typeCol).as("channel"),
        col(idCol).as("__tid"))

    val j = conv
      .join(touch, Seq("__u"))
      .withColumn("__dt", col("__cts") - col("__tts"))
      .where(col("__dt") >= 0L && col("__dt") <= lookbackUs)

    val byConv = Window.partitionBy("__cid")
    // earliest touch first: largest dt; ties by touch id ascending
    val firstW = Window.partitionBy("__cid").orderBy(col("__dt").desc, col("__tid").asc)
    // latest touch first: smallest dt; ties by touch id DESCENDING so a
    // two-way same-instant tie makes different touches first and last
    val lastW = Window.partitionBy("__cid").orderBy(col("__dt").asc, col("__tid").desc)

    val raw = pow(lit(2.0), -(col("__dt").cast("double") / lit(halfLifeUs)))
    val r = j
      .withColumn("__k", count(lit(1)).over(byConv))
      .withColumn("__ra", row_number().over(firstW))
      .withColumn("__rd", row_number().over(lastW))
      .withColumn("__raw", raw)
      .withColumn("__rawsum", sum(raw).over(byConv))

    val wPos = when(col("__k") === 1, lit(1.0))
      .when(col("__k") === 2, lit(0.5))
      .when(col("__ra") === 1 || col("__rd") === 1, lit(0.4))
      .otherwise(lit(0.2) / (col("__k") - lit(2)).cast("double"))

    r.groupBy("channel")
      .agg(
        count(lit(1)).as("touches"),
        countDistinct(col("__cid")).as("conversions"),
        q6(sum(lit(1.0) / col("__k").cast("double"))).as("credit_linear"),
        q6(sum(col("__raw") / col("__rawsum"))).as("credit_decay"),
        q6(sum(wPos)).as("credit_position"),
        q6(sum(when(col("__rd") === 1, lit(1.0)).otherwise(lit(0.0)))).as("credit_last"),
        q6(sum(when(col("__ra") === 1, lit(1.0)).otherwise(lit(0.0)))).as("credit_first"))
  }
}
