package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration across heterogeneous sources — the step between
  * "every doc has a quality score" and "one global threshold": raw
  * scores are NOT comparable across sources (a news site's median
  * quality differs from a forum's), so per-source selection uses
  * within-group normalized scores (the RefinedWeb/CCNet per-bucket
  * threshold idea).
  *
  *   - `percentileWithin`: percent_rank of the score inside each group
  *     (ties share a rank — stable under any input order).
  *   - `robustZ`: (x − median) / (1.4826·MAD) — outlier gauge immune
  *     to the heavy tails that wreck a mean/σ z-score. Exact
  *     median/MAD via the sort-based percentile aggregate: right up
  *     to ~10^8 rows per group; beyond that the [[graft.text.Vocab]]
  *     GK-quantile path (T13b) supplies the approximate alternative.
  *
  * Both are window/aggregate closed forms — fully DuckDB-replayable.
  */
object Calibrate {

  /** Adds `pct_rank` (4dp): percent_rank of `scoreCol` within each
    * group. One sort-shuffle keyed on the group columns.
    */
  def percentileWithin(df: DataFrame, scoreCol: String, groupCols: Seq[String]): DataFrame =
    df.withColumn(
      "pct_rank",
      round(percent_rank().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(scoreCol))), 4))

  /** Exact weighted isotonic regression of a binary (or bounded) label
    * on a score — the calibration map p̂(score) as a MONOTONE step
    * function, fitted by pool-adjacent-violators. PAV over per-distinct-
    * score (mean, weight) pairs is EXACTLY the row-level solution
    * (isotonic regression only ever pools adjacent blocks, and rows
    * sharing a score are one block from the start), so the corpus
    * collapses to one groupBy(score) aggregate and the PAV stack runs on
    * the driver over score-cardinality-many blocks — model state, the
    * [[graft.sim.Pca]] convention. Returns the breakpoint frame
    * (score_lo, score_hi, p) for serving via a range join or a
    * broadcast UDF-free `when` chain; here as a DataFrame join-able by
    * `score between lo and hi`.
    */
  def isotonic(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      maxPoints: Long = 1L << 20
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val grouped = df
      .groupBy(col(scoreCol).cast("double").as("s"))
      .agg(sum(col(labelCol).cast("double")).as("sy"), count(lit(1)).cast("double").as("w"))
    // positive-guard BEFORE the collect: a continuous score must be
    // quantized by the caller (round / fixed-width bins) — bin-level
    // PAV stays exact for the binned score, and the driver holds
    // score-cardinality blocks, not corpus rows
    val card = grouped.count()
    require(card <= maxPoints,
      s"$card distinct scores exceed maxPoints=$maxPoints: quantize the score before isotonic()")
    val pts = grouped
      .orderBy("s")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

    // PAV: maintain a stack of blocks (sLo, sHi, sumY, w); merge while
    // the monotonicity y/w is violated
    case class Block(lo: Double, hi: Double, sy: Double, w: Double) { def m: Double = sy / w }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Block]
    pts.foreach { case (s, sy, w) =>
      var b = Block(s, s, sy, w)
      while (stack.nonEmpty && stack.last.m >= b.m) {
        val t = stack.remove(stack.length - 1)
        b = Block(t.lo, b.hi, t.sy + b.sy, t.w + b.w)
      }
      stack += b
    }
    stack.toSeq.map(b => (b.lo, b.hi, b.sy / b.w, b.w.toLong))
      .toDF("score_lo", "score_hi", "p_cal", "n")
  }

  /** Adds `robust_z` (4dp) plus the per-group `med` and `mad` it used.
    * Degenerate groups (MAD = 0: over half the values identical) get
    * robust_z = 0 rather than ±∞ — flagged by mad = 0 in the output.
    */
  def robustZ(df: DataFrame, scoreCol: String, groupCols: Seq[String]): DataFrame = {
    val meds = df
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($scoreCol, 0.5)").as("med"))
    val withMed = df.join(broadcast(meds), groupCols)
    val mads = withMed
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(abs($scoreCol - med), 0.5)").as("mad"))
    withMed
      .join(broadcast(mads), groupCols)
      .withColumn(
        "robust_z",
        when(col("mad") > 0,
          round((col(scoreCol) - col("med")) / (lit(1.4826) * col("mad")), 4))
          .otherwise(lit(0.0)))
  }

  /** Quantile normalization: map each CURRENT value onto the REFERENCE
    * distribution's value at the same quantile — the batch-effect /
    * scorecard-migration alignment transform (genomics' quantile
    * normalization; "make source B's scores comparable to source A's").
    * Entirely rank arithmetic: the current rank uses rank() (min rank —
    * tied values map to the SAME reference element, so output is
    * deterministic with no tiebreak column), the reference index is the
    * floor mapping 1 + ⌊(rank−1)·(n_ref−1)/(n_cur−1)⌋, and the mapped
    * value is a SELECTED reference element — integers and data values
    * only, no interpolation, exact on any engine.
    *
    * Both ranks run through [[Rank]] (range-partition + broadcast
    * offsets — NO single-partition WindowExec, so both frames can be
    * corpus-sized) + one integer-key join. Output: id, v, mapped.
    */
  def quantileMap(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      idCol: String): DataFrame = {
    val rv = Rank.withGlobalRowNumber(
      ref.select(col(valueCol).cast("double").as("rv")), "idx", Seq(col("rv")))
    val nRef = rv.agg(count(lit(1))).head().getLong(0)
    require(nRef >= 2, "Calibrate.quantileMap: reference needs >= 2 rows")
    // min-rank (SQL rank()): tied current values map to the SAME
    // reference element, deterministic with no tiebreak column
    val ranked = Rank.withGlobalMinRank(
      cur.select(col(idCol).as("id"), col(valueCol).cast("double").as("v")),
      "rk", Seq(col("v")), Seq(col("id")))
    val nCur = cur.count()
    val withIdx =
      if (nCur <= 1) ranked.withColumn("idx", lit(1L))
      else ranked.withColumn("idx",
        // integral `div`, not `/`: Spark's / is double division, and
        // the floor must be exact integer arithmetic like DuckDB's //
        (lit(1L) + expr(s"(cast(rk as bigint) - 1) * ${nRef - 1} div ${nCur - 1}"))
          .cast("bigint"))
    withIdx
      .join(rv, Seq("idx"))
      .select(col("id"), col("v"), col("rv").as("mapped"))
  }

  /** Platt scaling — the parametric sibling of [[isotonic]]: fit
    * σ(a + b·score) to the labels with the house IRLS logistic
    * ([[graft.ml.Glm.logistic]] — distributed Gram passes, driver-side
    * 2×2 solve) and attach the calibrated probability. Returns the
    * input plus `p_platt` (6dp). Prefer isotonic when the score-to-
    * probability map is non-sigmoid; Platt when calibration data is
    * scarce (2 parameters vs a step function).
    */
  def platt(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val m = graft.ml.Glm.logistic(df, labelCol, Seq(scoreCol))
    val eta = m.etaCol
    df.withColumn("p_platt", q6(lit(1.0) / (lit(1.0) + exp(-eta))))
  }
}
