package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-transition matrix — first-order Markov view of per-key event
  * sequences ("after viewing, 60% purchase, 40% leave"): the
  * process-mining companion to [[Funnel]]'s fixed-order analysis; drop-
  * off hotspots, loop detection, journey dashboards. Each key's events
  * are ordered by (ts, tie-break id), consecutive pairs come from ONE
  * `lead` window (same single key shuffle as the funnel), and the
  * matrix is a (from, to)-count aggregate with per-from probabilities
  * — state-space-sized, never corpus-sized.
  */
object Transitions {

  /** (from_type, to_type, n, p) — p = n / Σ n over the same from_type,
    * rounded to 6dp (an exact integer ratio). Sequence ends emit a
    * terminal `"__end"` row so per-from probabilities sum to 1.
    */
  def matrix(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      tieBreak: String
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val pairs = df
      .withColumn("__next", coalesce(lead(col(typeCol), 1).over(w), lit("__end")))
      .select(col(typeCol).as("from_type"), col("__next").as("to_type"))
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    counts
      .withColumn("p", round(col("n").cast("double") / sum("n").over(wf), 6))
  }
}
