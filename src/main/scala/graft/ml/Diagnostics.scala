package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-fit regression diagnostics — the checks an analyst runs on an
  * [[Ols]] fit before trusting its standard errors: serial-correlation-
  * robust covariance (Driscoll–Kraay), heteroskedasticity (Breusch–
  * Pagan) and autocorrelation (Durbin–Watson). Every statistic is a
  * closed form over sums the cluster produces in one or two passes,
  * and every one is exactly replayable in ANSI SQL.
  */
object Diagnostics {

  private def xCols(model: OlsModel): Seq[Column] = model.xNames.map {
    case "(intercept)" => lit(1.0)
    case name          => col(name).cast("double")
  }

  /** Driscoll–Kraay (1998) covariance: serial- AND cross-sectionally-
    * robust for panels/time series. The per-period score vector
    * h_t = Σ_{i∈t} u_it·x_it collapses the corpus to a PERIOD-length
    * series (one groupBy — at 100 TB that is thousands of rows, not
    * billions); the Newey–West kernel then runs over that tiny series
    * with Bartlett weights w_l = 1 − l/(L+1):
    * meat = Γ₀ + Σ_{l=1..L} w_l(Γ_l + Γ_l'), Γ_l = Σ_t h_t h_{t−l}',
    * V = (X'X)⁻¹ meat (X'X)⁻¹. Lag products via window lags on the
    * period frame — no self-join, no corpus re-scan.
    */
  def varianceDriscollKraay(
      df: DataFrame,
      model: OlsModel,
      y: String,
      timeCol: String,
      maxLag: Int
  ): Array[Array[Double]] = {
    val k = model.coef.length
    val xs = xCols(model)
    val u = Ols.residualCol(model, y)
    val scoreAggs = (0 until k).map(i => sum(col("__u") * xs(i)).as(s"h_$i"))
    val periods = df
      .withColumn("__u", u)
      .groupBy(col(timeCol).as("__t"))
      .agg(scoreAggs.head, scoreAggs.tail: _*)

    val w = Window.orderBy("__t")
    val withLags = (1 to maxLag).foldLeft(periods) { (d, l) =>
      (0 until k).foldLeft(d) { (d2, i) =>
        d2.withColumn(s"h_${i}_lag$l", lag(col(s"h_$i"), l).over(w))
      }
    }
    val gammaAggs =
      (for (i <- 0 until k; j <- 0 until k) yield sum(col(s"h_$i") * col(s"h_$j")).as(s"g0_${i}_$j")) ++
        (for (l <- 1 to maxLag; i <- 0 until k; j <- 0 until k)
          yield sum(col(s"h_$i") * col(s"h_${j}_lag$l")).as(s"g${l}_${i}_$j"))
    val row = withLags.na.fill(0.0).agg(gammaAggs.head, gammaAggs.tail: _*).head()

    var p = 0
    val meat = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- 0 until k) { meat(i)(j) = row.getDouble(p); p += 1 }
    for (l <- 1 to maxLag) {
      val wl = 1.0 - l.toDouble / (maxLag + 1)
      for (i <- 0 until k; j <- 0 until k) {
        val g = row.getDouble(p); p += 1
        meat(i)(j) += wl * g
        meat(j)(i) += wl * g
      }
    }
    val bread = LinAlg.inverse(model.gram)
    val tmp = LinAlg.matMul(bread, meat)
    LinAlg.matMul(tmp, bread)
  }

  def seDriscollKraay(df: DataFrame, model: OlsModel, y: String, timeCol: String, maxLag: Int): Array[Double] =
    varianceDriscollKraay(df, model, y, timeCol, maxLag)
      .zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Breusch–Pagan LM test for heteroskedasticity: regress u² on the
    * regressors; LM = n·R² of that auxiliary regression, χ²(k−1) under
    * homoskedasticity. One extra Gram pass with u² as the outcome.
    */
  def breuschPagan(df: DataFrame, model: OlsModel, y: String): (Double, Long) = {
    val u = Ols.residualCol(model, y)
    val aux = Ols.fit(
      df.withColumn("__u2", u * u),
      "__u2",
      model.xNames.filter(_ != "(intercept)"))
    // R² = 1 − SSR/SST from the aux model's own gram identities
    // (gram(0)(0) = n, xty(0) = Σu² since column 0 is the intercept)
    val ybar = aux.xty(0) / aux.gram(0)(0)
    val sst = aux.yty - aux.gram(0)(0) * ybar * ybar
    val r2 = 1.0 - aux.ssr / sst
    (aux.n.toDouble * r2, aux.n)
  }

  /** Durbin–Watson statistic over a total time order:
    * DW = Σ_t (u_t − u_{t−1})² / Σ u² — ≈ 2 under no first-order
    * autocorrelation, → 0 under positive, → 4 under negative. Pass
    * enough `order` columns for a TOTAL order (the
    * [[graft.ml.Panel.firstDifference]] rule).
    *
    * Scale shape: a naive `Window.orderBy(time)` funnels the corpus
    * through ONE task (the AUC lesson, [[Eval.auc]]); instead rows are
    * RANGE-partitioned and sorted on the time order, each partition
    * reduces to (Σdu² internal, Σu², first u, last u, n), and the
    * driver stitches the partition-boundary (first − previous last)²
    * terms — exact, with only #partitions rows leaving the cluster.
    */
  def durbinWatson(df: DataFrame, model: OlsModel, y: String, order: Seq[String]): Double = {
    val parts = df
      .withColumn("__u", Ols.residualCol(model, y))
      .select((order.map(col) :+ col("__u")): _*)
      .repartitionByRange(order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
      .select(col("__u"))
      .rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var n = 0L; var sumSq = 0.0; var sumDu2 = 0.0
        var first = 0.0; var last = 0.0; var prev = 0.0
        it.foreach { row =>
          val u = row.getDouble(0)
          if (n == 0L) first = u
          else { val d = u - prev; sumDu2 += d * d }
          sumSq += u * u
          prev = u; last = u; n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator((idx, n, sumSq, sumDu2, first, last))
      }
      .collect()
      .sortBy(_._1)

    var num = 0.0; var den = 0.0
    var prevLast = Double.NaN
    parts.foreach { case (_, _, sumSq, sumDu2, first, last) =>
      num += sumDu2
      if (!prevLast.isNaN) { val d = first - prevLast; num += d * d }
      den += sumSq
      prevLast = last
    }
    num / den
  }

  /** Benjamini–Hochberg FDR control over a frame of test results — the
    * multiple-testing gate the per-group test family needs (run
    * [[graft.ops.Drift.ksTest]] / [[graft.ops.Stats.welchT]] over 500
    * sources and ~25 "drifting" groups appear at α=0.05 by chance
    * alone): rank p ascending (ties broken by the key columns so the
    * rank — and therefore the flag set — is deterministic and
    * replayable), find k* = max{i : p_(i) ≤ α·i/m}, flag ranks ≤ k*.
    *
    * The rank runs through [[graft.ops.Rank.withGlobalRowNumber]]
    * (range partition + broadcast offsets — exact, NO single-partition
    * WindowExec), so BH scales past hypothesis frames that are
    * themselves corpus-sized (per-token tests over a web-scale vocab).
    * The step-up cutoff is a 1-row broadcast joined back.
    */
  /** @param dependent Benjamini–Yekutieli mode: divide the BH critical
    *        line by the harmonic number c(m) = Σ 1/i, making the FDR
    *        control valid under ARBITRARY p-value dependence (BY 2001)
    *        at a log(m) power cost. Default false = plain BH (PRDS).
    */
  def bhFdr(df: DataFrame, pCol: String, alpha: Double, tieBreak: Seq[String],
      dependent: Boolean = false): DataFrame = {
    val m = df.count()
    // harmonic ascending fold — exact replay is the same ascending sum
    val cm = if (dependent) {
      var s = 0.0; var i = 1L
      while (i <= m) { s += 1.0 / i; i += 1 }
      s
    } else 1.0
    val critDenom = if (dependent) lit(m.toDouble * cm) else lit(m)
    val ranked = graft.ops.Rank
      .withGlobalRowNumber(df, "rank", col(pCol).asc +: tieBreak.map(col(_).asc))
      .withColumn("rank", col("rank").cast("int"))
      .withColumn("bh_crit", round(lit(alpha) * col("rank") / critDenom, 10))
    val kStar = ranked
      .agg(coalesce(max(when(col(pCol) <= col("bh_crit"), col("rank"))), lit(0)).as("k_star"))
    ranked
      .crossJoin(broadcast(kStar))
      .withColumn("significant", (col("rank") <= col("k_star")).cast("int"))
  }

  /** Holm step-down multiplicity adjustment (+ Bonferroni and Šidák
    * columns) — the FWER sibling of [[bhFdr]]: adjusted
    * p_holm(i) = min(1, max_{j≤i} (m−j+1)·p_(j)), significant iff
    * p_holm ≤ α. The running max runs DISTRIBUTED: global rank via
    * [[graft.ops.Rank.withGlobalRowNumberAndPid]] (range exchange, no
    * single-partition window), per-partition prefix max, then a P-row
    * collected summary becomes broadcast carry-ins — exact, because
    * max has no accumulation error. Scales to hypothesis frames that
    * are themselves corpus-sized (per-token tests). Šidák's pow is
    * 6dp-quantized; Holm/Bonferroni are exact products.
    */
  def holm(
      df: DataFrame,
      pCol: String,
      alpha: Double,
      tieBreak: Seq[String]): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val m = df.count()
    val ranked = graft.ops.Rank
      .withGlobalRowNumberAndPid(df, "rank", col(pCol).asc +: tieBreak.map(col(_).asc))
      .withColumn("rank", col("rank").cast("int"))
      .withColumn("__raw", (lit(m) - col("rank") + 1).cast("double") * col(pCol))
      .localCheckpoint()
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("rank")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val perPid = ranked.groupBy("__pid").agg(max("__raw").as("__pmax"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    // carry-in: max of all PRIOR partitions (raws are ≥ 0, so 0 is a
    // neutral floor for the first partition)
    var acc = 0.0
    val carrySeq = perPid.map { case (pid, mx) => val c = acc; acc = math.max(acc, mx); (pid, c) }
    val spark = df.sparkSession
    import spark.implicits._
    val carry = carrySeq.toSeq.toDF("__pid", "__carry")
    ranked
      .join(broadcast(carry), Seq("__pid"))
      .withColumn("p_holm",
        least(lit(1.0), greatest(max(col("__raw")).over(pw), col("__carry"))))
      .withColumn("p_bonf", least(lit(1.0), lit(m.toDouble) * col(pCol)))
      .withColumn("p_sidak",
        q6(lit(1.0) - pow(lit(1.0) - col(pCol), lit(m.toDouble))))
      .withColumn("significant", (col("p_holm") <= alpha).cast("int"))
      .drop("__pid", "__raw", "__carry")
  }

  /** Storey (2002) q-values — the ESTIMATED-FDR companion of
    * [[bhFdr]]'s fixed-α step-up: π̂₀ = #{p > λ}/((1−λ)m) (the share
    * of true nulls, λ = 0.5 default) rescues power when many
    * hypotheses are non-null (BH implicitly assumes π₀ = 1), and
    * q_(i) = min_{j ≥ i} min(1, π̂₀·m·p_(j)/j) is each test's minimum
    * FDR at which it would be called. Returns the input plus
    * (rank, pi0, q_value).
    *
    * Scale shape: ranks via [[graft.ops.Rank.withGlobalRowNumberAndPid]]
    * (range exchange, never a single-partition window); the SUFFIX
    * running min runs as per-partition descending-rank windows plus a
    * P-row collected carry — and because min is EXACT (no accumulation
    * error), the distributed result is bit-identical to a sequential
    * scan, so the oracle replays it with a plain window.
    */
  def storeyQ(
      df: DataFrame,
      pCol: String,
      tieBreak: Seq[String],
      lambda: Double = 0.5): DataFrame = {
    require(lambda > 0 && lambda < 1, "Diagnostics.storeyQ: lambda in (0,1)")
    val agg = df.agg(
      count(lit(1)).as("m"),
      sum(when(col(pCol) > lambda, 1L).otherwise(0L)).as("ngt")).head()
    val m = agg.getLong(0); val nGt = agg.getLong(1)
    require(m > 0, "Diagnostics.storeyQ: empty input")
    val pi0 = math.min(1.0, nGt / ((1.0 - lambda) * m))
    val pi0m = pi0 * m
    val ranked = graft.ops.Rank
      .withGlobalRowNumberAndPid(df, "rank", col(pCol).asc +: tieBreak.map(col(_).asc))
      .withColumn("rank", col("rank").cast("int"))
      .withColumn("__raw",
        least(lit(1.0), lit(pi0m) * col(pCol) / col("rank").cast("double")))
      .localCheckpoint()
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col("rank").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // carry-in per pid: the min over all LATER partitions (higher pids
    // hold higher ranks under the ascending range exchange); 1.0 is a
    // neutral ceiling since every __raw is already ≤ 1
    val perPid = ranked.groupBy("__pid").agg(min("__raw").as("__pmin"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(-_._1)
    var acc = 1.0
    val carrySeq = perPid.map { case (pid, mn) => val c = acc; acc = math.min(acc, mn); (pid, c) }
    val spark = df.sparkSession
    import spark.implicits._
    val carry = carrySeq.toSeq.toDF("__pid", "__carry")
    ranked
      .join(broadcast(carry), Seq("__pid"))
      .withColumn("pi0", round(lit(pi0), 6))
      .withColumn("q_value",
        round(least(min(col("__raw")).over(pw), col("__carry")), 6))
      .drop("__pid", "__raw", "__carry")
  }

  /** Per-key autocorrelation function + Ljung–Box Q — "is this entity's
    * metric white noise?" across every user/source at once (the
    * portmanteau sibling of the single-series [[durbinWatson]]).
    *
    * ρ_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² with the FULL-series
    * mean/denominator (the standard ACF; statsmodels' default), and
    * Q_K = n(n+2) Σ_{k≤K} ρ_k²/(n−k). Implementation: per-key
    * `row_number` over the keyed window (sharded on the key — never
    * single-partition), ONE self-join with `1 ≤ Δrn ≤ maxLag` covering
    * every lag at once (band join on the key; each row meets ≤ maxLag
    * partners, so the join is O(n·maxLag), not O(n²)), then a
    * (key, lag) aggregate against broadcast per-key moments. The
    * cumulative Q runs over ≤ maxLag rows per key. Keys with n ≤
    * maxLag or zero variance are dropped (ρ undefined).
    * Returns one row per (key, lag): n, rho, lb_q.
    */
  def ljungBox(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      tieCol: String,
      maxLag: Int): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"),
      col(valueCol).cast("double").as("x"), col(tieCol).as("tb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("t"), col("tb"))))
      .select("k", "rn", "x")
    val moments = base.groupBy("k").agg(
      count(lit(1)).as("n"),
      avg("x").as("mu"),
      (sum(col("x") * col("x")) - count(lit(1)) * avg("x") * avg("x")).as("den"))
      .where(col("n") > maxLag && col("den") > 0)
    val a = base.as("a"); val b = base.as("b")
    val lagged = a.join(b,
      col("a.k") === col("b.k") &&
        col("a.rn") - col("b.rn") >= 1 && col("a.rn") - col("b.rn") <= maxLag)
      .select(col("a.k").as("k"), (col("a.rn") - col("b.rn")).as("lag"),
        col("a.x").as("xt"), col("b.x").as("xl"))
    val rho = lagged.join(moments, Seq("k"))
      .groupBy(col("k"), col("lag"))
      .agg(
        first("n").as("n"),
        (sum((col("xt") - col("mu")) * (col("xl") - col("mu"))) /
          first("den")).as("rho_raw"))
    val cum = Window.partitionBy("k").orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rho
      .withColumn("lb_raw",
        col("n") * (col("n") + 2) *
          sum(col("rho_raw") * col("rho_raw") / (col("n") - col("lag"))).over(cum))
      .select(
        col("k").as(keyCol), col("lag"), col("n"),
        q6(col("rho_raw")).as("rho"), q6(col("lb_raw")).as("lb_q"))
  }

  /** Per-key one-lag Granger causality — "does x's PAST improve the
    * one-lag autoregression of y": F for adding x_{t−1} to
    * y ~ y_{t−1}. With exactly three standardized regressable columns
    * the whole test folds to pairwise correlations (no matrix solve):
    * R²_r = r(y,y₁)², R²_u = (r₁² + r₂² − 2r₁r₂r₃)/(1 − r₃²) with
    * r₁ = r(y,y₁), r₂ = r(y,x₁), r₃ = r(y₁,x₁), and
    * F = (R²_u − R²_r)/(1 − R²_u)·(n − 3), df = (1, n−3).
    * One keyed lag window + one (key)-aggregate of the nine moment
    * sums; keys with n ≤ 3 aligned rows or a degenerate correlation
    * (zero variance, |r₃| = 1) return null F. Correlations replay in
    * DuckDB via the raw-moment form.
    */
  def grangerOneLag(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      yCol: String,
      xCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"), col(tieCol).as("tb"),
      col(yCol).cast("double").as("y"), col(xCol).cast("double").as("x"))
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("x1", lag("x", 1).over(w))
      .where(col("y1").isNotNull && col("x1").isNotNull)
    val m = base.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum("y").as("sy"), sum(col("y") * col("y")).as("syy"),
      sum("y1").as("sa"), sum(col("y1") * col("y1")).as("saa"),
      sum("x1").as("sb"), sum(col("x1") * col("x1")).as("sbb"),
      sum(col("y") * col("y1")).as("sya"),
      sum(col("y") * col("x1")).as("syb"),
      sum(col("y1") * col("x1")).as("sab"))
    // variance guards FIRST: under ANSI a zero denominator throws, so
    // every division sits inside a lazy `when` branch
    val dyy = col("n") * col("syy") - col("sy") * col("sy")
    val daa = col("n") * col("saa") - col("sa") * col("sa")
    val dbb = col("n") * col("sbb") - col("sb") * col("sb")
    def corrOf(sxy: Column, sx: Column, sy: Column, dx: Column, dy: Column) =
      when(dx > 0 && dy > 0, (col("n") * sxy - sx * sy) / sqrt(dx * dy))
    val r1 = corrOf(col("sya"), col("sy"), col("sa"), dyy, daa)
    val r2 = corrOf(col("syb"), col("sy"), col("sb"), dyy, dbb)
    val r3 = corrOf(col("sab"), col("sa"), col("sb"), daa, dbb)
    val r2u = when(abs(r3) < 1.0,
      (r1 * r1 + r2 * r2 - lit(2.0) * r1 * r2 * r3) / (lit(1.0) - r3 * r3))
    val f = when(r2u < 1.0,
      (r2u - r1 * r1) / (lit(1.0) - r2u) * (col("n") - lit(3)).cast("double"))
    m.select(
      col("k").as(keyCol),
      col("n").cast("long").as("n"),
      when(dyy > 0 && daa > 0, q6(r1)).as("r_y_ylag"),
      when(dyy > 0 && dbb > 0, q6(r2)).as("r_y_xlag"),
      when(col("n") > 3 && dyy > 0 && daa > 0 && dbb > 0 &&
        abs(r3) < 1.0 && r2u < 1.0, q6(f)).as("f_stat"))
  }

  /** Chow test — one structural break in the simple regression y ~ x:
    * F = ((SSR_pooled − SSR_a − SSR_b)/2) / ((SSR_a + SSR_b)/(n−4)).
    * Each SSR folds from the 5 raw moments (SSR = Syy − Sxy²/Sxx,
    * centered), so the whole test is ONE regime-keyed aggregate + a
    * reduce — no per-regime refits. Degenerate regimes (n ≤ 2 or zero
    * x-variance) return null F. Returns one row.
    */
  def chow(df: DataFrame, yCol: String, xCol: String, regimeCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(regimeCol).cast("int").as("g"),
      col(yCol).cast("double").as("y"), col(xCol).cast("double").as("x"))
    val per = base.groupBy("g").agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    def ssrOf(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column, syy: Column) = {
      val cxx = sxx - sx * sx / n.cast("double")
      val cxy = sxy - sx * sy / n.cast("double")
      val cyy = syy - sy * sy / n.cast("double")
      (cyy - cxy * cxy / cxx, cxx)
    }
    val a = per.agg(
      sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
      sum("sxx").as("sxx"), sum("sxy").as("sxy"), sum("syy").as("syy"),
      min("n").as("n_min"), count(lit(1)).as("regimes"),
      // per-regime SSRs fold as sums of the same closed form; the ANSI
      // when-guard skips zero-x-variance regimes (cxx_min then nulls
      // the emission anyway)
      sum(when(col("sxx") - col("sx") * col("sx") / col("n").cast("double") > 0,
        (col("syy") - col("sy") * col("sy") / col("n").cast("double")) -
          pow(col("sxy") - col("sx") * col("sy") / col("n").cast("double"), 2.0) /
            (col("sxx") - col("sx") * col("sx") / col("n").cast("double"))))
        .as("ssr_split"),
      min(col("sxx") - col("sx") * col("sx") / col("n").cast("double")).as("cxx_min"),
      sum(when(col("g") === 1, col("n")).otherwise(lit(0))).as("n_b"))
    val (ssrPooled, cxxPooled) =
      ssrOf(col("n"), col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"))
    val f = ((ssrPooled - col("ssr_split")) / lit(2.0)) /
      (col("ssr_split") / (col("n") - lit(4)).cast("double"))
    a.select(
      col("n").cast("long").as("n"),
      (col("n") - col("n_b")).cast("long").as("n_a"),
      col("n_b").cast("long").as("n_b"),
      when(cxxPooled > 0, q6(ssrPooled)).as("ssr_pooled"),
      when(col("cxx_min") > 0, q6(col("ssr_split"))).as("ssr_split"),
      when(col("regimes") === 2 && col("n_min") > 2 && col("cxx_min") > 0 &&
        cxxPooled > 0 && col("ssr_split") > 0, q6(f)).as("f_stat"))
  }

  /** Per-row influence diagnostics for the simple regression y ~ x:
    * leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx, studentized-ish residual via
    * s² = SSR/(n−2), and Cook's D = eᵢ²·hᵢ/(p·s²·(1−hᵢ)²) with p = 2.
    * ONE moment aggregate broadcasts back and every row's numbers are
    * row-local closed forms — no window, no sort, corpus-scale by
    * construction (the "which training rows own this fit" audit).
    * Requires n > 2 and positive x-variance and residual variance
    * (else the diagnostic columns are null — fit is degenerate).
    */
  def influenceSimple(
      df: DataFrame,
      idCol: String,
      yCol: String,
      xCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(idCol).as("id"), col(yCol).cast("double").as("y"), col(xCol).cast("double").as("x"))
    val m = base.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n").cast("double"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n").cast("double"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n").cast("double"))
    val ok = col("n") > 2 && col("cxx") > 0
    val slope = col("cxy") / col("cxx")
    val icept = (col("sy") - slope * col("sx")) / col("n").cast("double")
    val s2 = (col("cyy") - col("cxy") * col("cxy") / col("cxx")) /
      (col("n") - lit(2)).cast("double")
    base.crossJoin(broadcast(m))
      .withColumn("e",
        when(ok, col("y") - (icept + slope * col("x"))))
      .withColumn("h",
        when(ok, lit(1.0) / col("n").cast("double") +
          (col("x") - col("sx") / col("n").cast("double")) *
            (col("x") - col("sx") / col("n").cast("double")) / col("cxx")))
      .select(
        col("id").as(idCol),
        q6(col("e")).as("resid"),
        // h ~ 1/n is tiny by construction: 1e9 grid keeps ~5 significant
        // digits where the house 6dp would flatten it
        q9(col("h")).as("leverage"),
        when(ok && s2 > 0 && col("h") < 1.0,
          q9(col("e") * col("e") * col("h") /
            (lit(2.0) * s2 * (lit(1.0) - col("h")) * (lit(1.0) - col("h")))))
          .as("cooks_d"))
  }

  private def q9(c: Column): Column =
    floor(c * lit(1e9) + lit(0.5)).cast("double") / lit(1e9)
}
