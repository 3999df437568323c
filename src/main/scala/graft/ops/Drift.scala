package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift test per group — the NUMERIC
  * member of the drift family: [[graft.text.Keyness.jsDivergence]]
  * gauges token distributions, [[graft.streaming.EmbedStream]] gauges
  * embeddings, this gauges any numeric column (doc length, quality
  * score, latency) per source against the pooled corpus:
  * D_g = max over observed values x of |F_g(x) − F_all(x)|, the
  * discrete-data convention (ties allowed; the supremum over step
  * functions is attained at data points).
  *
  * Shape: one (group, value) count aggregate, a dense group×distinct-
  * value frame (the [[graft.text.Keyness]] honest-cost argument —
  * #groups × #distinct values rows, never corpus-sized), cumulative
  * sums per group via one window, and a max per group. Every number is
  * an exact integer ratio until the final rounding.
  */
object Drift {

  /** (groupCol, n_group, d_stat, p_value): per-group KS statistic vs
    * the pooled distribution (4dp) plus the Kolmogorov asymptotic
    * p-value (6dp): with effective n = n_g·n/(n_g+n) and
    * λ = (√en + 0.12 + 0.11/√en)·D (Stephens 1970),
    * p = 2Σ_{k≥1}(−1)^{k−1}e^{−2k²λ²} truncated at 25 terms (residual
    * < e^{−2·26²λ²} — zero at any λ that matters) and clamped to
    * [0, 1]. p is computed FROM the 4dp-quantized D, so both engines
    * exponentiate identical inputs. The asymptotic treats the pooled
    * CDF as an independent sample (the standard scorecard-monitoring
    * reading); for small groups it is conservative.
    */
  def ksTest(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val values = counts.groupBy("v").agg(sum("c").as("cv"))
    val groups = counts.groupBy("g").agg(sum("c").as("ng"))
    val total = counts.agg(sum("c").as("n"))

    val dense = groups
      .crossJoin(broadcast(values))
      .join(counts, Seq("g", "v"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(total))

    val wg = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("cum_g", sum(col("c")).over(wg))
      .withColumn("cum_all", sum(col("cv")).over(wg))
      .withColumn(
        "gap",
        abs(col("cum_g").cast("double") / col("ng").cast("double") -
          col("cum_all").cast("double") / col("n").cast("double")))
      .groupBy(col("g").as(groupCol))
      .agg(
        max(col("ng")).as("n_group"),
        round(max(col("gap")), 4).as("d_stat"),
        max(col("n")).as("__n_all"))
      .withColumn("p_value", {
        val en = col("n_group").cast("double") * col("__n_all").cast("double") /
          (col("n_group") + col("__n_all")).cast("double")
        val sq = sqrt(en)
        val lam = (sq + lit(0.12) + lit(0.11) / sq) * col("d_stat")
        val series = (1 to 25).map { k =>
          lit(if (k % 2 == 1) 1.0 else -1.0) *
            exp(lit(-2.0 * k * k) * lam * lam)
        }.reduce(_ + _)
        floor(least(lit(1.0), greatest(lit(0.0), lit(2.0) * series)) * lit(1e6) +
          lit(0.5)).cast("double") / lit(1e6)
      })
      .drop("__n_all")
  }

  /** Population Stability Index between a reference and a current
    * sample of a numeric column — the scorecard-monitoring standard
    * beside KS ([[ksTest]]) and JS divergence: bin by the REFERENCE
    * deciles, PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) (< 0.1 stable,
    * > 0.25 action). Decile edges are EXACT ORDER STATISTICS at ranks
    * ⌊i·n/10⌋ (data values, no interpolation — any engine selects the
    * identical element); bin counts are integers; only the final
    * ln/division is float. Laplace-style `eps` keeps empty bins finite.
    *
    * The 9 edge ranks come from [[Rank.withGlobalRowNumber]] (range
    * partition + broadcast offsets — NO single-partition WindowExec, so
    * the reference can be corpus-sized; driver holds only the 9 edge
    * values), then one when-chain binning pass + decile-sized
    * aggregate per side. Output: one row per bin + the total PSI
    * repeated (10-row window).
    */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      eps: Double = 1e-6,
      approxEdges: Boolean = false,
      approxAccuracy: Int = 10000): DataFrame = {
    val rv = ref.select(col(valueCol).cast("double").as("v"))
    val n = rv.count()
    require(n >= 10, "Drift.psi: reference too small for deciles")
    // approx path: ONE Greenwald-Khanna aggregate (rank error <=
    // n/approxAccuracy) replaces the range shuffle + checkpoint — the
    // >10^8-row reference path; bins shift by at most the rank error, so
    // PSI moves O(error) (DriftSpec pins the drift). Default exact.
    val edges =
      if (approxEdges)
        rv.agg(percentile_approx(col("v"),
            array((1 to 9).map(i => lit(i / 10.0)): _*), lit(approxAccuracy)))
          .head().getSeq[Double](0).toArray
      else {
        val ranks = (1 to 9).map(i => i.toLong * n / 10)
        Rank.withGlobalRowNumber(rv, "rn", Seq(col("v")))
          .where(col("rn").isin(ranks: _*))
          .orderBy("rn")
          .collect().map(_.getDouble(0))
      }
    def binCol = {
      // bin = number of edges strictly below v (ties land in the lower
      // bin): build the when-chain lowest-edge-first so v <= e0 wins
      // before v <= e1 is consulted
      edges.zipWithIndex.reverse.foldLeft(lit(9)) { case (acc, (e, i)) =>
        when(col("v") <= e, lit(i)).otherwise(acc)
      }
    }
    def counts(df: DataFrame, out: String) = df
      .select(col(valueCol).cast("double").as("v"))
      .withColumn("bin", binCol)
      .groupBy("bin").agg(count(lit(1)).as(out))
    val bins = ref.sparkSession.range(0, 10).select(col("id").cast("int").as("bin"))
    val joined = bins
      .join(counts(ref.select(col(valueCol)), "n_ref"), Seq("bin"), "left")
      .join(counts(cur.select(col(valueCol)), "n_cur"), Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val tr = sum(col("n_ref")).over(Window.partitionBy()).cast("double")
    val tc = sum(col("n_cur")).over(Window.partitionBy()).cast("double")
    val pr = col("n_ref") / tr + eps
    val pc = col("n_cur") / tc + eps
    joined
      .withColumn("p_ref", round(col("n_ref") / tr, 6))
      .withColumn("p_cur", round(col("n_cur") / tc, 6))
      .withColumn("psi", round(sum((pc - pr) * log(pc / pr)).over(Window.partitionBy()), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("p_ref"), col("p_cur"), col("psi"))
  }
}
