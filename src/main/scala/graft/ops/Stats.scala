package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical test statistics over grouped data — companions to the KS
  * drift test ([[Drift]]): chi-square for categorical×categorical
  * association, Welch's t for numeric-mean drift per group, and share
  * concentration gauges for corpus-mix monitoring. Every statistic is a
  * closed form over counts/sums, so each runs in one or two codegen'd
  * aggregate passes and DuckDB can replay it exactly.
  */
object Stats {

  /** Pearson chi-square test of independence between two categorical
    * columns. One (a, b) count aggregate (contingency-table-sized, never
    * corpus-sized); expected counts come from broadcast-joined margins;
    * the statistic reduces over the observed cells only, with the
    * missing-cell mass Σ_missing E added in closed form
    * (Σ (O−E)²/E over O=0 cells is Σ E = n − Σ_observed E).
    * Returns one row: chi2, dof, n, and Cramér's V.
    */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    // cells is contingency-table-sized; materialize it ONCE — the three
    // margin aggregates derive from it with different column prunings,
    // which defeats exchange reuse and would rescan the corpus 4×
    // (pinned by PlanSpec)
    val cells = df.groupBy(col(a).as("ca"), col(b).as("cb")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val ma = cells.groupBy("ca").agg(sum("o").as("na"))
    val mb = cells.groupBy("cb").agg(sum("o").as("nb"))
    val tot = cells.agg(sum("o").as("n"))

    cells
      .join(broadcast(ma), Seq("ca"))
      .join(broadcast(mb), Seq("cb"))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("na").cast("double") * col("nb").cast("double") / col("n").cast("double"))
      .withColumn("d", col("o").cast("double") - col("e"))
      .agg(
        sum(col("d") * col("d") / col("e")).as("obs_term"),
        sum(col("e")).as("e_obs"),
        countDistinct(col("ca")).as("ka"),
        countDistinct(col("cb")).as("kb"),
        max(col("n")).as("n"))
      .select(
        round(col("obs_term") + (col("n").cast("double") - col("e_obs")), 4).as("chi2"),
        ((col("ka") - 1) * (col("kb") - 1)).cast("long").as("dof"),
        col("n").cast("long").as("n"),
        round(
          sqrt((col("obs_term") + (col("n").cast("double") - col("e_obs"))) /
            (col("n").cast("double") * least(col("ka") - 1, col("kb") - 1).cast("double"))),
          4).as("cramers_v"))
  }

  /** Welch's t per group vs the REST of the corpus (the leave-one-out
    * contrast — the natural "is this source drifting?" question). One
    * per-group (n, Σy, Σy²) aggregate; rest-of-corpus moments are the
    * broadcast totals minus the group's own, so the whole table costs
    * one corpus pass regardless of group count. Emits t and the
    * Welch–Satterthwaite dof, 4dp.
    */
  def welchT(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n1"), sum(y).as("s1"), sum(y * y).as("q1"))
    val tot = g.agg(sum("n1").as("nt"), sum("s1").as("st"), sum("q1").as("qt"))

    g.crossJoin(broadcast(tot))
      .withColumn("n2", col("nt") - col("n1"))
      .withColumn("s2", col("st") - col("s1"))
      .withColumn("q2", col("qt") - col("q1"))
      .withColumn("m1", col("s1") / col("n1").cast("double"))
      .withColumn("m2", col("s2") / col("n2").cast("double"))
      .withColumn("v1",
        (col("q1") - col("s1") * col("s1") / col("n1").cast("double")) / (col("n1") - 1).cast("double"))
      .withColumn("v2",
        (col("q2") - col("s2") * col("s2") / col("n2").cast("double")) / (col("n2") - 1).cast("double"))
      .withColumn("se2", col("v1") / col("n1").cast("double") + col("v2") / col("n2").cast("double"))
      .select(
        col("g").as(groupCol),
        col("n1").cast("long").as("n_group"),
        round(col("m1"), 4).as("mean_group"),
        round(col("m2"), 4).as("mean_rest"),
        round((col("m1") - col("m2")) / sqrt(col("se2")), 4).as("t_welch"),
        round(
          col("se2") * col("se2") /
            ((col("v1") / col("n1").cast("double")) * (col("v1") / col("n1").cast("double")) / (col("n1") - 1).cast("double") +
              (col("v2") / col("n2").cast("double")) * (col("v2") / col("n2").cast("double")) / (col("n2") - 1).cast("double")),
          2).as("df_welch"))
  }

  /** One-way ANOVA — does the group mean differ ANYWHERE across k
    * groups (the k-group generalization of [[welchT]]'s two-sample
    * contrast, classical equal-variance form):
    * F = (SSB/(k−1)) / (SSW/(n−k)) with SSB = Σ nⱼ(x̄ⱼ − x̄)²,
    * SSW = SST − SSB, plus the η² = SSB/SST effect size. ONE per-group
    * moment aggregate (k rows) + closed forms — every sum exact for
    * integer-ish values, divisions last, 6dp.
    */
  def anovaOneWay(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val y = col(valueCol).cast("double")
    val g = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("double").as("nj"), sum(y).as("sj"), sum(y * y).as("qj"))
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    // raw sums of squares are corpus-magnitude (Σv² ~ 1e9 at sf0.1), so
    // cross-engine summation-order noise (~1e-5 absolute) would trip a
    // 6dp quantizer — the SS columns quantize at 2dp; the O(1) ratios
    // (F, η²) keep 6dp
    def q2(c: Column) = floor(c * lit(1e2) + lit(0.5)).cast("double") / lit(1e2)
    g.agg(
      count(lit(1)).as("k"),
      sum("nj").as("n"),
      sum("sj").as("st"),
      sum("qj").as("qt"),
      sum(col("sj") * col("sj") / col("nj")).as("sb_raw"))
      .select(
        col("k").cast("long").as("k"),
        col("n").cast("long").as("n"),
        q2(col("sb_raw") - col("st") * col("st") / col("n")).as("ss_between"),
        q2(col("qt") - col("sb_raw")).as("ss_within"),
        q6(((col("sb_raw") - col("st") * col("st") / col("n")) / (col("k") - 1)) /
          ((col("qt") - col("sb_raw")) / (col("n") - col("k")))).as("f_stat"),
        q6((col("sb_raw") - col("st") * col("st") / col("n")) /
          (col("qt") - col("st") * col("st") / col("n"))).as("eta_sq"))
  }

  /** Brown–Forsythe/Levene homogeneity-of-variance test — ANOVA on the
    * absolute deviations from each group's MEDIAN (the robust 1974
    * variant): the gate before trusting [[anovaOneWay]]'s pooled
    * variance. One exact per-group percentile pass (group-cardinality
    * frame, broadcast back — the [[winsorizedMean]] shape), then the
    * same one-aggregate ANOVA closed form over |x − medⱼ|.
    */
  def leveneTest(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val meds = df.groupBy(col(groupCol).as("__lev_g"))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__lev_med"))
    val dev = df
      .join(broadcast(meds), col(groupCol) === col("__lev_g"))
      .select(col(groupCol), abs(col(valueCol).cast("double") - col("__lev_med")).as("__z"))
    anovaOneWay(dev, "__z", groupCol)
  }

  /** Paired t-test on (x, y) rows — same-unit before/after contrasts
    * (the matched companion to [[welchT]]'s independent-samples form):
    * one aggregate over d = x − y, t = d̄ / (s_d/√n) with the explicit-
    * moment sample variance, dof = n − 1. One codegen pass, one row
    * out, 6dp.
    */
  def pairedT(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val d = col(xCol).cast("double") - col(yCol).cast("double")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    df.agg(count(lit(1)).as("n"), sum(d).as("sd"), sum(d * d).as("qd"))
      .select(
        col("n").cast("long").as("n"),
        q6(col("sd") / col("n").cast("double")).as("mean_diff"),
        q6(sqrt((col("qd") - col("sd") * col("sd") / col("n").cast("double")) /
          (col("n") - 1).cast("double"))).as("sd_diff"),
        q6((col("sd") / col("n").cast("double")) /
          sqrt(((col("qd") - col("sd") * col("sd") / col("n").cast("double")) /
            (col("n") - 1).cast("double")) / col("n").cast("double"))).as("t"))
  }

  /** Winsorized per-group statistics: clip `valueCol` to its group's
    * [pLo, pHi] interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the q17 bridge) and report the clipped mean next
    * to the raw one — the outlier-robust location gauge. Two passes:
    * one groupBy computing both cut points (exact percentile — for
    * sketch-accuracy at extreme scale swap `percentile_approx`), one
    * broadcast-join + clip + mean. The cut frame is group-cardinality-
    * sized, never corpus-sized.
    */
  def winsorizedMean(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      pLo: Double = 0.05,
      pHi: Double = 0.95
  ): DataFrame = {
    val y = col(valueCol).cast("double")
    val cuts = df.groupBy(col(groupCol).as("__wg"))
      .agg(percentile(y, lit(pLo)).as("lo"), percentile(y, lit(pHi)).as("hi"))
    df.join(broadcast(cuts), col(groupCol) === col("__wg"))
      .withColumn("yw", least(greatest(y, col("lo")), col("hi")))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("long").as("n"),
        round(min(col("lo")), 4).as("p_lo"),
        round(min(col("hi")), 4).as("p_hi"),
        round(avg(col("yw")), 4).as("mean_winsorized"),
        round(avg(y), 4).as("mean_raw"))
  }

  /** Share-concentration gauges of a child category within each parent
    * group: Herfindahl–Hirschman index Σ s², Shannon entropy −Σ s ln s,
    * and the Gini coefficient of the share distribution
    * G = (2 Σ_i i·c_(i))/(k Σ c) − (k+1)/k over ascending-sorted counts.
    * One (parent, child) count aggregate; ranks via a per-parent window
    * (child-cardinality-sized partitions); integer arithmetic until the
    * final divisions. The corpus-mix dashboard primitive: HHI near 1 =
    * one child dominates; entropy near ln k = balanced.
    */
  def concentration(df: DataFrame, parent: String, child: String): DataFrame = {
    val counts = df.groupBy(col(parent).as("p"), col(child).as("c")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("p").orderBy(col("n").asc, col("c").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .groupBy(col("p").as(parent))
      .agg(
        count(lit(1)).cast("long").as("k"),
        sum("n").cast("long").as("n_total"),
        round(sum(col("n").cast("double") * col("n").cast("double")) /
          (sum(col("n")).cast("double") * sum(col("n")).cast("double")), 4).as("hhi"),
        round(-sum(col("n").cast("double") * log(col("n").cast("double"))) /
          sum(col("n")).cast("double") + log(sum(col("n")).cast("double")), 4).as("entropy"),
        round(
          lit(2.0) * sum(col("rk").cast("double") * col("n").cast("double")) /
            (count(lit(1)).cast("double") * sum(col("n")).cast("double")) -
            (count(lit(1)) + 1).cast("double") / count(lit(1)).cast("double"),
          4).as("gini"))
  }

  /** RFM (recency / frequency / monetary) user features — the classic
    * activity-segmentation triple over an event stream, plus 1–5
    * quintile scores per axis so downstream mixes can sample by
    * segment. One groupBy collapses the corpus to user rows; recency is
    * measured in whole days back from the corpus max timestamp (one
    * broadcast scalar); quintiles are exact ntile(5) over a
    * deterministic total order (value, key) via [[Rank.withGlobalNtile]]
    * — range-partitioned + broadcast offsets, NO single-partition
    * WindowExec, so the user frame can be corpus-sized.
    */
  def rfm(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val maxTs = df.agg(max(unix_timestamp(col(tsCol)))).head().getLong(0)
    val per = df.groupBy(col(keyCol))
      .agg(
        ((lit(maxTs) - max(unix_timestamp(col(tsCol)))) / 86400L).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        round(sum(col(valueCol).cast("double")), 4).as("monetary"))
    // each pass checkpoints its (narrow) input, so the chain re-reads
    // checkpoint blocks rather than recomputing the groupBy three times
    val r = Rank.withGlobalNtile(per, "r_score", 5,
      Seq(col("recency_days").desc, col(keyCol)))
    val f = Rank.withGlobalNtile(r, "f_score", 5,
      Seq(col("frequency").asc, col(keyCol)))
    Rank.withGlobalNtile(f, "m_score", 5,
      Seq(col("monetary").asc, col(keyCol)))
  }

  /** Spearman rank correlation of two numeric columns per group. Ranks
    * use the average-of-tied-row-numbers convention (the classical
    * mid-rank), built from two window passes that both engines compute
    * identically: a deterministic row_number inside the group (ties
    * broken by `tieCol`), then the avg of those row numbers over equal
    * values. The correlation itself is the Pearson closed form over the
    * two rank columns — one final aggregate per group, no driver state.
    * Per-group windows shard by the grouping key, so no global sort; at
    * scale each group's rows co-locate on its hash partition.
    */
  def spearman(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      tieCol: String): DataFrame = {
    val g = Window.partitionBy(col(groupCol))
    def midRank(c: String, out: String)(d: DataFrame): DataFrame = {
      val rn = row_number().over(g.orderBy(col(c), col(tieCol)))
      d.withColumn(s"_rn_$out", rn.cast("double"))
        .withColumn(out, avg(col(s"_rn_$out")).over(Window.partitionBy(col(groupCol), col(c))))
        .drop(s"_rn_$out")
    }
    val ranked = midRank(xCol, "_rx")(midRank(yCol, "_ry")(df))
    val n = count(lit(1)).cast("double")
    val sx = sum(col("_rx")); val sy = sum(col("_ry"))
    val sxx = sum(col("_rx") * col("_rx")); val syy = sum(col("_ry") * col("_ry"))
    val sxy = sum(col("_rx") * col("_ry"))
    ranked
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        round((n * sxy - sx * sy) /
          sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6).as("rho"))
  }

  /** Benford first-digit audit of a positive 2-decimal-place money
    * column. The leading digit is extracted in EXACT integer arithmetic
    * (scale to cents as BIGINT, then the first character of its decimal
    * representation) — no log10 on doubles, whose libm ULP differences
    * near powers of ten would diverge across engines. Output: one row
    * per digit 1-9 with observed count/share, the Benford expected
    * share, and the total chi-square repeated on every row (window
    * total — the table is 9 rows, so the window is free).
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counts = df
      .where(col(valueCol) > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    val tot = sum(col("n")).over(w).cast("double")
    // expected shares are the SAME nine double constants the oracle SQL
    // ships (Double.toString round-trip), so the chi-square arithmetic
    // is +,-,*,/ over bit-identical inputs on both engines — no libm
    // log10 in either plan
    val expShare = (1 to 9).foldLeft(lit(Double.NaN)) { (acc, d) =>
      when(col("digit") === d, lit(benfordShare(d))).otherwise(acc)
    }
    val e = expShare * tot
    counts
      .withColumn("share", round(col("n") / tot, 6))
      .withColumn("exp_share", round(expShare, 6))
      .withColumn(
        "chi2",
        // unobserved digits contribute (0−E)²/E = E; their total is
        // n − Σ_observed E because the nine expected shares sum to 1
        // (the chiSquare missing-mass trick)
        round(sum((col("n") - e) * (col("n") - e) / e).over(w) +
          (tot - sum(e).over(w)), 4))
  }

  /** Benford's expected first-digit share, log10(1 + 1/d). Exposed so
    * the oracle SQL can ship the identical binary64 constants.
    */
  def benfordShare(d: Int): Double = math.log10(1.0 + 1.0 / d)

  /** Gini coefficient of a 2-decimal money column per group — the
    * inequality/concentration gauge beside the share-based HHI
    * ([[concentration]]): G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over
    * the ascending sort. Computed ENTIRELY in integer cents: ranks ×
    * cents products and their sums stay in BIGINT (exact on any
    * engine; tie order among equal values provably cancels out of
    * Σ i·x), so the only float op is one final division of identical
    * integers — no summation-order noise at all. The per-group sort is
    * a window sharded on the group key. BIGINT bounds: n·Σx overflows
    * at ~10^19 cents·rows (petabyte-scale money columns); beyond that,
    * switch the two sums to DECIMAL(38).
    */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val ranked = df
      .select(col(groupCol).as("g"), cents.as("x"))
      .withColumn("i", row_number().over(Window.partitionBy("g").orderBy("x")))
    // portable quantizer, not round(): identical IEEE ops both engines
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    ranked
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum(col("i") * col("x")).as("six"))
      .select(
        col("g").as(groupCol),
        col("n"),
        col("sx").as("sum_cents"),
        q6((lit(2) * col("six") - (col("n") + 1) * col("sx")).cast("double") /
          (col("n") * col("sx")).cast("double")).as("gini"))
  }
}
