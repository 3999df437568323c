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

  /** Kendall's τ-b rank correlation per group — the tie-robust sibling
    * of [[spearman]] (reference regime: `hdfe` panels correlate a
    * covariate against time per entity; τ-b is the standard monotone-
    * association gauge when the series has repeats). Pairs are generated
    * by a WITHIN-GROUP self-join (`idCol` totally orders rows, `<` keeps
    * each unordered pair once), classified into concordant / discordant
    * / x-tied / y-tied in exact integer counts, and
    * τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with n₀ = n(n−1)/2,
    * n₁ = #pairs tied on x, n₂ = #pairs tied on y. Everything up to the
    * final division is BIGINT, so both engines agree bit-for-bit.
    *
    * Scale contract: O(m²) pairs per group, experiment-unit-sized groups
    * (user series, panel entities) — the same bounded-group contract as
    * every pairwise op here. The join shuffles on the group key only;
    * for groups beyond ~10⁴ rows switch to the O(m log m) merge-sort
    * inversion count (not implemented — no current caller has such
    * groups).
    */
  def kendallTau(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      idCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(groupCol).as("g"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"),
      col(idCol).as("i"))
    val l = base.as("l"); val r = base.as("r")
    val pairs = l.join(r, col("l.g") === col("r.g") && col("l.i") < col("r.i"))
      .select(
        col("l.g").as("g"),
        (col("l.x") - col("r.x")).as("dx"),
        (col("l.y") - col("r.y")).as("dy"))
    val cls = pairs.groupBy("g").agg(
      sum(when(col("dx") =!= 0 && col("dy") =!= 0 &&
        signum(col("dx")) === signum(col("dy")), 1L).otherwise(0L)).as("concordant"),
      sum(when(col("dx") =!= 0 && col("dy") =!= 0 &&
        signum(col("dx")) =!= signum(col("dy")), 1L).otherwise(0L)).as("discordant"),
      sum(when(col("dx") === 0, 1L).otherwise(0L)).as("tied_x"),
      sum(when(col("dy") === 0, 1L).otherwise(0L)).as("tied_y"))
    val ns = base.groupBy("g").agg(count(lit(1)).as("n"))
    val n0 = (col("n") * (col("n") - 1) / 2).cast("long")
    cls.join(ns, Seq("g"))
      .select(
        col("g").as(groupCol), col("n"),
        col("concordant"), col("discordant"), col("tied_x"), col("tied_y"),
        q6((col("concordant") - col("discordant")).cast("double") /
          sqrt(((n0 - col("tied_x")) * (n0 - col("tied_y"))).cast("double"))).as("tau_b"))
  }

  /** Kruskal–Wallis H test — the rank-based one-way ANOVA companion to
    * [[anovaOneWay]] (non-normal metric drift across k corpus sources /
    * experiment arms). Global mid-ranks come from [[Rank.withGlobalMinRank]]
    * (range exchange + broadcast offsets — NEVER the single-partition
    * `Window.orderBy`) plus the hash-windowed tie count: mid-rank =
    * min-rank + (t−1)/2, exactly DuckDB's `rank() + (count(*) OVER
    * (PARTITION BY v) − 1)/2`. H = 12/(N(N+1)) Σ R_g²/n_g − 3(N+1),
    * tie-corrected by C = 1 − Σ(t³−t)/(N³−N). Ranks and tie counts are
    * exact integers/half-integers, so both engines replay the statistic
    * inside the 1e-6 quantizer at any N where doubles hold (N ≲ 10⁸;
    * beyond that the rank sums themselves need DECIMAL).
    * Returns one row: n, k groups, h, h_adj, dof.
    */
  def kruskalWallis(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      tieCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(groupCol).as("g"), col(valueCol).cast("double").as("v"), col(tieCol).as("tb"))
    val ranked = Rank.withGlobalMinRank(base, "minr", Seq(col("v")), Seq(col("tb")))
      .withColumn("t", count(lit(1)).over(Window.partitionBy("v")))
      .withColumn("r", col("minr") + (col("t") - 1) / lit(2.0))
    val perGroup = ranked.groupBy("g")
      .agg(count(lit(1)).cast("double").as("ng"), sum("r").as("rg"))
    val gstats = perGroup.agg(
      sum(col("rg") * col("rg") / col("ng")).as("sr2"),
      count(lit(1)).as("k"),
      sum("ng").as("nn"))
    // tie spectrum: one row per distinct value — value-table-sized
    val ties = ranked.groupBy("v").agg(first(col("t")).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("t3t"))
    gstats.crossJoin(broadcast(ties)).select(
      col("nn").cast("long").as("n"),
      col("k"),
      (col("k") - 1).as("dof"),
      q6(lit(12.0) / (col("nn") * (col("nn") + 1)) * col("sr2") -
        lit(3.0) * (col("nn") + 1)).as("h"),
      q6((lit(12.0) / (col("nn") * (col("nn") + 1)) * col("sr2") -
        lit(3.0) * (col("nn") + 1)) /
        (lit(1.0) - col("t3t").cast("double") /
          (col("nn") * col("nn") * col("nn") - col("nn")))).as("h_adj"))
  }

  /** Jarque–Bera normality test per group — sample skewness/kurtosis
    * from one raw-moment aggregate pass (s₁..s₄), centralized in closed
    * form: m₂ = s₂/n − μ², m₃ = s₃/n − 3μs₂/n + 2μ³,
    * m₄ = s₄/n − 4μs₃/n + 6μ²s₂/n − 3μ⁴; JB = n/6 (S² + (K−3)²/4).
    * The oracle ships the TEXTUALLY identical centralization algebra, so
    * the only cross-engine divergence is summation order in the four
    * sums — relative 1e-16, far inside the 1e-6 quantizer for any
    * column whose 4th power fits a double (|x| ≲ 10⁹ at 10⁹ rows).
    * One shuffle (the group-by); no window, no second pass.
    */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val x = col(valueCol).cast("double")
    val agg = df.groupBy(col(groupCol).as("g")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("s1"), sum(x * x).as("s2"),
      sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"))
    val mu = col("s1") / col("n")
    val m2 = col("s2") / col("n") - mu * mu
    val m3 = col("s3") / col("n") - lit(3.0) * mu * col("s2") / col("n") +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4") / col("n") - lit(4.0) * mu * col("s3") / col("n") +
      lit(6.0) * mu * mu * col("s2") / col("n") - lit(3.0) * mu * mu * mu * mu
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    agg.select(
      col("g").as(groupCol),
      col("n").cast("long").as("n"),
      q6(skew).as("skewness"),
      q6(kurt).as("kurtosis"),
      q6(col("n") / lit(6.0) *
        (skew * skew + (kurt - 3.0) * (kurt - 3.0) / lit(4.0))).as("jb"))
  }

  /** McNemar's test for paired binary outcomes (did the labeler/model
    * change its mind on the same unit?) — counts the two discordant
    * cells over 0/1 columns and applies the continuity-corrected
    * χ²₁ = (|b−c|−1)²/(b+c). Pure integer aggregate → one row:
    * n, both, neither, a_only (b), b_only (c), chi2. b+c = 0 (no
    * discordant pairs) returns chi2 = 0 rather than 0/0.
    */
  def mcnemar(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val a = col(aCol).cast("int"); val b = col(bCol).cast("int")
    val agg = df.agg(
      count(lit(1)).as("n"),
      // n_both / n_neither: `both` is reserved (trim syntax) in ANSI SQL
      sum(when(a === 1 && b === 1, 1L).otherwise(0L)).as("n_both"),
      sum(when(a === 0 && b === 0, 1L).otherwise(0L)).as("n_neither"),
      sum(when(a === 1 && b === 0, 1L).otherwise(0L)).as("a_only"),
      sum(when(a === 0 && b === 1, 1L).otherwise(0L)).as("b_only"))
    val bc = col("a_only") + col("b_only")
    val d = abs(col("a_only") - col("b_only")).cast("double") - lit(1.0)
    agg.select(
      col("n"), col("n_both"), col("n_neither"), col("a_only"), col("b_only"),
      when(bc === 0, lit(0.0))
        .otherwise(q6(d * d / bc.cast("double"))).as("chi2"))
  }

  /** Theil–Sen robust slope per group: the median of all pairwise
    * slopes (dy/dx over pairs with dx ≠ 0), intercept = median of
    * (y − slope·x). Breakdown point 29% — the outlier-proof companion
    * to [[graft.ml.GroupedOls]] for per-entity trends. Same
    * bounded-group O(m²) pair contract as [[kendallTau]] (one shared
    * self-join shape); medians are Spark's exact interpolating
    * `percentile`, which DuckDB's `quantile_cont` replays exactly.
    */
  def theilSen(
      df: DataFrame,
      groupCol: String,
      xCol: String,
      yCol: String,
      idCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(groupCol).as("g"),
      col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"),
      col(idCol).as("i"))
    val l = base.as("l"); val r = base.as("r")
    val slopes = l.join(r, col("l.g") === col("r.g") && col("l.i") < col("r.i"))
      .where(col("l.x") =!= col("r.x"))
      .select(
        col("l.g").as("g"),
        ((col("l.y") - col("r.y")) / (col("l.x") - col("r.x"))).as("s"))
    val med = slopes.groupBy("g").agg(
      count(lit(1)).as("n_pairs"),
      expr("percentile(s, 0.5)").as("ts_slope"))
    base.join(med, Seq("g"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        first("n_pairs").as("n_pairs"),
        first("ts_slope").as("b"),
        expr("percentile(y - ts_slope * x, 0.5)").as("a"))
      .select(
        col("g").as(groupCol), col("n"), col("n_pairs"),
        q6(col("b")).as("slope"), q6(col("a")).as("intercept"))
  }

  /** Lorenz curve by ntile bucket — the curve behind [[gini]]: bucket
    * the positive money column into `buckets` exact global ntiles
    * ([[Rank.withGlobalNtile]] — range exchange, no single-partition
    * window), then per-bucket population/value shares and their running
    * totals. All sums are integer cents; the only windows run over the
    * `buckets`-row aggregate (corpus-independent — 10 rows is 10 rows
    * at any scale). Returns one row per bucket: n, cents, cum_cents,
    * pop_share, cum_value_share.
    */
  def lorenz(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      buckets: Int = 10): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val cents = round(col(valueCol) * 100).cast("long")
    val base = df.where(col(valueCol) > 0)
      .select(cents.as("x"), col(tieCol).as("tb"))
    val tiled = Rank.withGlobalNtile(base, "bucket", buckets, Seq(col("x"), col("tb")))
    val per = tiled.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("x").as("cents"))
    // buckets-row frame: the unpartitioned window here is over ≤`buckets`
    // rows by construction, not the corpus
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    per
      .withColumn("cum_cents", sum("cents").over(w))
      .withColumn("cum_n", sum("n").over(w))
      .select(
        col("bucket"), col("n"), col("cents"), col("cum_cents"),
        q6(col("cum_n").cast("double") / sum("n").over(tot)).as("cum_pop_share"),
        q6(col("cum_cents").cast("double") / sum("cents").over(tot)).as("cum_value_share"))
  }

  /** Exact per-group mode with a deterministic tie-break (smallest
    * value wins — the pandas `Series.mode().iloc[0]` convention made
    * explicit): two hash aggregates ((group, value) counts → per-group
    * argmax via `max_by` on the (count, reversed-value) pair). Output
    * one row per group: mode, n_mode (its count), n_distinct.
    * Value-cardinality shuffles only.
    */
  def modeByGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("n"))
    val ranked = counts
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("g")))
      // value-cardinality frame; the window shards on the group key
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy(col("n").desc, col("v"))))
    ranked.where(col("rk") === 1)
      .select(col("g").as(groupCol), col("v").as("mode"),
        col("n").as("n_mode"), col("nd").as("n_distinct"))
  }

  /** Tukey IQR fences per group — the univariate outlier gate beside
    * the multivariate [[graft.sim.Outliers.pcaMahalanobis]]: exact
    * interpolating quartiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), fences at q1/q3 ∓ `mult`·IQR, and the per-group
    * outlier census in ONE more aggregated pass (quartiles broadcast
    * back by group key — two corpus passes total, no window). Returns
    * one row per group: n, q1, q3, iqr, lo/hi fences, n_low, n_high.
    * For >10⁸-row groups swap the exact percentile for the GK sketch
    * (the [[graft.text.Vocab]] strataQuantiles path) — documented
    * tradeoff, exact is the oracle-parity default.
    */
  def iqrFences(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      mult: Double = 1.5): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("x"))
    val quart = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      expr("percentile(x, 0.25)").as("q1"),
      expr("percentile(x, 0.75)").as("q3"))
      .withColumn("lo", col("q1") - lit(mult) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(mult) * (col("q3") - col("q1")))
    base.join(quart, Seq("g"))
      .groupBy("g")
      .agg(
        first("n").as("n"),
        first("q1").as("rq1"), first("q3").as("rq3"),
        first("lo").as("rlo"), first("hi").as("rhi"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .select(
        col("g").as(groupCol), col("n"),
        q6(col("rq1")).as("q1"), q6(col("rq3")).as("q3"),
        q6(col("rq3") - col("rq1")).as("iqr"),
        q6(col("rlo")).as("fence_lo"), q6(col("rhi")).as("fence_hi"),
        col("n_low"), col("n_high"))
  }

  /** Cochran–Mantel–Haenszel test for a 2×2 association stratified by a
    * confounder (treatment×outcome across experiment cohorts / corpus
    * sources). Per-stratum counts reduce to one stratum-sized frame;
    * E_i = r1·c1/n, V_i = r1·r2·c1·c2/(n²(n−1)), and the continuity-
    * corrected CMH = (|Σa − ΣE| − ½)² / ΣV. Integer counts throughout;
    * one group-by plus a stratum-sized final aggregate. Degenerate
    * strata (n ≤ 1 or a zero margin) contribute 0 to both sums, the
    * textbook convention.
    */
  def cmh(
      df: DataFrame,
      stratumCol: String,
      exposureCol: String,
      outcomeCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val e = col(exposureCol).cast("int"); val o = col(outcomeCol).cast("int")
    val per = df.groupBy(col(stratumCol).as("s")).agg(
      sum(when(e === 1 && o === 1, 1L).otherwise(0L)).as("a"),
      sum(when(e === 1, 1L).otherwise(0L)).as("r1"),
      sum(when(e === 0, 1L).otherwise(0L)).as("r2"),
      sum(when(o === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(o === 0, 1L).otherwise(0L)).as("c2"),
      count(lit(1)).as("nn"))
    val valid = col("nn") > 1 && col("r1") > 0 && col("r2") > 0 &&
      col("c1") > 0 && col("c2") > 0
    val agg = per.agg(
      count(lit(1)).as("strata"),
      sum(when(valid, col("a")).otherwise(0L)).as("sum_a"),
      sum(when(valid,
        col("r1").cast("double") * col("c1") / col("nn")).otherwise(0.0)).as("sum_e"),
      sum(when(valid,
        col("r1").cast("double") * col("r2") * col("c1") * col("c2") /
          (col("nn").cast("double") * col("nn") * (col("nn") - 1))).otherwise(0.0)).as("sum_v"))
    val d = abs(col("sum_a") - col("sum_e")) - lit(0.5)
    agg.select(
      col("strata"), col("sum_a"), q6(col("sum_e")).as("sum_e"),
      q6(col("sum_v")).as("sum_v"),
      when(col("sum_v") === 0, lit(0.0))
        .otherwise(q6(d * d / col("sum_v"))).as("cmh_chi2"))
  }

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

  /** Cochran–Armitage trend test — "does the success rate move
    * monotonically with the dose": T = Σ sᵢ(rᵢ − nᵢp̄) over dose levels
    * with numeric scores sᵢ, Var T = p̄(1−p̄)(Σ sᵢ²nᵢ − (Σ sᵢnᵢ)²/N),
    * z = T/√Var. The ordinal upgrade of the χ² independence test
    * ([[chiSquare]] ignores level order; this is powered against
    * monotone alternatives). One dose-level aggregate (level-sized,
    * never corpus-sized) then closed forms; DuckDB replays exactly.
    * Returns one row: n, levels, t_stat, var_t, z (6dp), chi2 (6dp).
    */
  def cochranArmitage(df: DataFrame, doseCol: String, succCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val lvl = df
      .groupBy(col(doseCol).cast("double").as("s"))
      .agg(count(lit(1)).as("ni"), sum(col(succCol).cast("double")).as("ri"))
    lvl
      .agg(
        sum("ni").as("n"), count(lit(1)).as("levels"), sum("ri").as("r"),
        sum(col("s") * col("ri")).as("sr"),
        sum(col("s") * col("ni").cast("double")).as("sn"),
        sum(col("s") * col("s") * col("ni").cast("double")).as("ssn"))
      .select(
        col("n").cast("long").as("n"),
        col("levels").cast("long").as("levels"),
        q6(col("sr") - col("r") / col("n").cast("double") * col("sn")).as("t_stat"),
        q6((col("r") / col("n").cast("double")) *
          (lit(1.0) - col("r") / col("n").cast("double")) *
          (col("ssn") - col("sn") * col("sn") / col("n").cast("double"))).as("var_t"),
        // Var T = 0 (all-success, all-failure, or single level) → null z,
        // and the ANSI when-guard keeps the division unevaluated
        when(varT > 0,
          q6((col("sr") - col("r") / col("n").cast("double") * col("sn")) /
            sqrt(varT))).as("z"),
        when(varT > 0,
          q6(pow(col("sr") - col("r") / col("n").cast("double") * col("sn"), 2.0) /
            varT)).as("chi2"))
  }

  /** Row-level winsorize transform — clamp a value to its group's
    * [pLo, pHi] exact interpolating percentiles (the ROW-preserving
    * sibling of [[winsorizedMean]], which reduces). One per-group
    * percentile aggregate (group-cardinality frame) broadcast-joined
    * back; the clamp is row-local. Adds `<valueCol>_w`.
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      pLo: Double = 0.05,
      pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "winsorize: need 0 <= pLo < pHi <= 1")
    val y = col(valueCol).cast("double")
    val cuts = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(y, lit(pLo)).as("__lo"), percentile(y, lit(pHi)).as("__hi"))
    df.join(broadcast(cuts), groupCols)
      .withColumn(s"${valueCol}_w", least(greatest(y, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Indirect standardization — the epidemiology SIR/SMR: per group,
    * expected events = Σ_strata n_{g,s} · rate_ref(s) with the
    * reference rates taken from the WHOLE frame's strata, and
    * SIR = observed/expected. The fair "is this source/cohort hot"
    * comparison when groups have different stratum mixes (the
    * count-data sibling of [[graft.ml.Causal.stratifiedATE]]).
    * Two (group × stratum)-sized aggregates + one broadcast join;
    * all closed forms. Groups with zero expected return null SIR.
    */
  def indirectStandardization(
      df: DataFrame,
      groupCol: String,
      stratumCol: String,
      eventCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val cells = df
      .groupBy(col(groupCol).as("g"), col(stratumCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(col(eventCol).cast("double")).as("o"))
      .localCheckpoint(true)
    val ref = cells.groupBy("s")
      .agg((sum("o") / sum("n").cast("double")).as("rate_ref"))
    cells
      .join(broadcast(ref), Seq("s"))
      .groupBy("g")
      .agg(
        sum("n").as("n"), sum("o").as("observed"),
        sum(col("n").cast("double") * col("rate_ref")).as("expected"))
      .select(
        col("g").as(groupCol),
        col("n").cast("long").as("n"),
        col("observed").cast("long").as("observed"),
        q6(col("expected")).as("expected"),
        when(col("expected") > 0,
          q6(col("observed") / col("expected"))).as("sir"))
  }

  private def varT: Column =
    (col("r") / col("n").cast("double")) *
      (lit(1.0) - col("r") / col("n").cast("double")) *
      (col("ssn") - col("sn") * col("sn") / col("n").cast("double"))

  /** Empirical-Bayes (beta-binomial) shrinkage of per-group success
    * rates — the standard CTR / acceptance-rate stabilizer: method-of-
    * moments prior from the observed rate spread (m = mean of group
    * rates, v = their (g−1)-divisor sample variance, prior strength
    * K = m(1−m)/v − 1, α = mK, β = (1−m)K), then each group's release
    * is the posterior mean (yᵢ+α)/(nᵢ+K) — small groups pull to m,
    * big groups keep their own rate. When the observed spread exceeds
    * the binomial maximum (v ≥ m(1−m), K ≤ 0) or is degenerate
    * (v = 0), shrunk rates are null — the "prior undefined" review
    * flag, not a silent fallback. Two group-sized aggregates; every
    * emitted value a closed form.
    */
  def ebShrink(df: DataFrame, groupCol: String, succCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val per = df
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(col(succCol).cast("double")).as("y"))
      .withColumn("p", col("y") / col("n").cast("double"))
      .localCheckpoint(true)
    val prior = per.agg(
      count(lit(1)).as("gk"), sum("p").as("sp"), sum(col("p") * col("p")).as("spp"))
      .select(
        col("gk"),
        (col("sp") / col("gk").cast("double")).as("m"),
        when(col("gk") > 1,
          (col("spp") - col("sp") * col("sp") / col("gk").cast("double")) /
            (col("gk") - lit(1)).cast("double")).as("v"))
      .withColumn("k_prior",
        when(col("v") > 0, col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0)))
    per
      .crossJoin(broadcast(prior))
      .select(
        col("g").as(groupCol),
        col("n").cast("long").as("n"),
        col("y").cast("long").as("y"),
        q6(col("p")).as("rate_raw"),
        when(col("k_prior") > 0,
          q6((col("y") + col("m") * col("k_prior")) /
            (col("n").cast("double") + col("k_prior")))).as("rate_shrunk"),
        when(col("k_prior") > 0, q6(col("m") * col("k_prior"))).as("alpha"),
        when(col("k_prior") > 0,
          q6((lit(1.0) - col("m")) * col("k_prior"))).as("beta"))
  }

  /** Gamma–Poisson (negative-binomial) empirical-Bayes rate shrinkage —
    * [[ebShrink]]'s sibling for COUNT-per-EXPOSURE data (events/day,
    * defects/unit): MoM Gamma prior from the group-rate spread
    * (β = m/v, α = m²/v on the plain group rates), posterior-mean
    * release (yᵢ+α)/(eᵢ+β). Degenerate spread (v ≤ 0) → null release.
    * Two group-sized aggregates, closed forms.
    */
  def ebShrinkRate(
      df: DataFrame,
      groupCol: String,
      countCol: String,
      exposureCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val per = df
      .groupBy(col(groupCol).as("g"))
      .agg(sum(col(countCol).cast("double")).as("y"),
        sum(col(exposureCol).cast("double")).as("e"))
      .where(col("e") > 0)
      .withColumn("r", col("y") / col("e"))
      .localCheckpoint(true)
    val prior = per.agg(
      count(lit(1)).as("gk"), sum("r").as("sr"), sum(col("r") * col("r")).as("srr"))
      .select(
        col("gk"),
        (col("sr") / col("gk").cast("double")).as("m"),
        when(col("gk") > 1,
          (col("srr") - col("sr") * col("sr") / col("gk").cast("double")) /
            (col("gk") - lit(1)).cast("double")).as("v"))
    per
      .crossJoin(broadcast(prior))
      .select(
        col("g").as(groupCol),
        col("y").cast("long").as("y"),
        q6(col("e")).as("exposure"),
        q6(col("r")).as("rate_raw"),
        when(col("v") > 0,
          q6((col("y") + col("m") * col("m") / col("v")) /
            (col("e") + col("m") / col("v")))).as("rate_shrunk"),
        when(col("v") > 0, q6(col("m") * col("m") / col("v"))).as("alpha"),
        when(col("v") > 0, q6(col("m") / col("v"))).as("beta"))
  }

  /** Wald–Wolfowitz runs test per key — "is this entity's binary
    * sequence random or streaky": R = observed runs (1 + sign
    * changes via one keyed lag), E[R] = 1 + 2n₁n₀/n,
    * Var R = 2n₁n₀(2n₁n₀−n)/(n²(n−1)), z = (R−E)/√Var. One keyed
    * window + one keyed aggregate; single-sign or length-1 keys
    * return null z (variance degenerate — the review-flag
    * convention). Returns one row per key: n, n1, n0, runs, e_runs,
    * z (6dp).
    */
  def runsTest(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      binCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"), col(tieCol).as("tb"),
      col(binCol).cast("int").as("b"))
      .withColumn("chg",
        when(lag("b", 1).over(w).isNull, lit(1))
          .when(lag("b", 1).over(w) =!= col("b"), lit(1))
          .otherwise(lit(0)))
    val agg = base.groupBy("k").agg(
      count(lit(1)).as("n"), sum("b").as("n1"),
      sum(lit(1) - col("b")).as("n0"), sum("chg").as("runs"))
    val two = lit(2.0) * col("n1").cast("double") * col("n0").cast("double")
    val er = lit(1.0) + two / col("n").cast("double")
    val vr = two * (two - col("n").cast("double")) /
      (col("n").cast("double") * col("n").cast("double") *
        (col("n") - lit(1)).cast("double"))
    agg.select(
      col("k").as(keyCol),
      col("n").cast("long").as("n"),
      col("n1").cast("long").as("n1"),
      col("n0").cast("long").as("n0"),
      col("runs").cast("long").as("runs"),
      q6(er).as("e_runs"),
      when(col("n1") > 0 && col("n0") > 0 && col("n") > 1 && vr > 0,
        q6((col("runs").cast("double") - er) / sqrt(vr))).as("z"))
  }
}
