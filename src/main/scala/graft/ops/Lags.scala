package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Within-group lags/leads — Spark-first version of the reference
  * `make_lags` / `make_one_lag` (reference: hdfe/hdfe.py:184,253).
  *
  * The reference relies on the DataFrame's physical row order inside each
  * group; a distributed engine has no such order, so the caller supplies
  * explicit `order` columns (this also makes results deterministic). Lags
  * are computed with `lag`/`lead` over `Window.partitionBy(group)
  * .orderBy(order)` — a single shuffle on the group key, sort within
  * partitions, no joins.
  *
  * Naming follows the reference: `<out>_lag_<k>` where k>0 looks back and
  * k<0 looks forward; with `fillZeros=true` each lag also gets an
  * `<out>_lag_<k>_mi` missing-indicator and the missing value is 0
  * (reference: hdfe.py:280-297). With `fillZeros=false` missing lags are
  * NULL (the reference uses NaN).
  */
object Lags {

  /** Per-group fractional change vs the previous row (pandas
    * `groupby().pct_change()`): (v − lag v)/|lag v|, null on the first
    * row of a group and where the base is 0. Same single key-shuffle
    * window as [[makeLags]]; output 6dp floor-quantized.
    */
  def pctChange(
      df: DataFrame,
      group: Seq[String],
      order: Seq[String],
      valueCol: String,
      out: String
  ): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(order.map(col): _*)
    val prev = lag(col(valueCol).cast("double"), 1).over(w)
    df.withColumn(out,
      when(prev.isNotNull && prev =!= 0.0,
        floor((col(valueCol).cast("double") - prev) / abs(prev) * lit(1e6) + lit(0.5))
          .cast("double") / lit(1e6)))
  }

  /** Per-group forward-fill / back-fill of nulls (pandas
    * `groupby().ffill()/bfill()`): the last (resp. next) non-null value
    * in `order` — two IGNORE NULLS growing-frame windows sharing one
    * key shuffle (the reversed-sort trick from SURVEY §8g keeps the
    * backward pass O(n), never a FOLLOWING frame).
    */
  def fillGaps(
      df: DataFrame,
      group: Seq[String],
      order: Seq[String],
      valueCol: String,
      direction: String = "forward"
  ): DataFrame = {
    require(Set("forward", "backward").contains(direction),
      s"direction must be forward|backward, got $direction")
    val w =
      if (direction == "forward")
        Window.partitionBy(group.map(col): _*).orderBy(order.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(group.map(col): _*)
          .orderBy(order.map(c => col(c).desc): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(valueCol, last(col(valueCol), ignoreNulls = true).over(w))
  }

  def makeLags(
      df: DataFrame,
      group: Seq[String],
      order: Seq[String],
      outcomes: Seq[String],
      nLagsBack: Int,
      nLagsForward: Int,
      fillZeros: Boolean
  ): DataFrame = {
    val w = Window.partitionBy(group.map(col): _*).orderBy(order.map(col): _*)
    val lags = (-nLagsForward to -1) ++ (1 to nLagsBack)
    lags.foldLeft(df) { (acc, k) =>
      outcomes.foldLeft(acc) { (acc2, out) =>
        val raw = if (k > 0) lag(col(out), k).over(w) else lead(col(out), -k).over(w)
        val name = s"${out}_lag_$k"
        if (fillZeros)
          acc2
            .withColumn(name, coalesce(raw, lit(0.0)))
            .withColumn(s"${name}_mi", when(raw.isNull, 1.0).otherwise(0.0))
        else acc2.withColumn(name, raw)
      }
    }
  }
}
