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

  /** Order-n sequential patterns — the n-step generalization of
    * [[matrix]] (which is n=2 with an `__end` sentinel): per key, the
    * event-type sequence ordered by (ts, tie-break) slides an n-window
    * via n−1 stacked `lead`s over the SAME keyed sort (one shuffle,
    * one window pass), and complete n-grams aggregate to
    * (pattern, count, share-of-complete-ngrams). Pattern-space-sized
    * output; `minCount` prunes the tail. The standard "what do users
    * do in threes" / crawl-session-motif query.
    */
  def ngrams(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      tieBreak: String,
      n: Int,
      minCount: Long = 1L): DataFrame = {
    require(n >= 2, "Transitions.ngrams: n must be ≥ 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    val steps = (1 until n).map(i => lead(col(typeCol), i).over(w).as(s"__s$i"))
    val withSteps = df.select((col(typeCol).as("__s0") +: steps): _*)
    val complete = withSteps.where((1 until n).map(i => col(s"__s$i").isNotNull)
      .reduce(_ && _))
    val pattern = concat_ws(">", (0 until n).map(i => col(s"__s$i")): _*)
    val counts = complete
      .select(pattern.as("pattern"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy() // pattern-space-sized frame, not corpus
    counts
      .withColumn("share",
        floor(col("n") / sum(col("n")).over(tot) * lit(1e6) + lit(0.5))
          .cast("double") / lit(1e6))
      .where(col("n") >= minCount)
  }

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
