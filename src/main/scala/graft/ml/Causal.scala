package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Design-based treatment-effect estimators composing the engine's own
  * GLM and OLS primitives — the observational-data companions to the
  * experimental contrasts ([[Panel.didTwoByTwo]], the within/FE family):
  * inverse-propensity weighting and the doubly-robust AIPW estimator
  * (Robins–Rotnitzky–Zhao 1994). Where DiD needs a parallel-trends
  * design and FE a panel, these need conditional ignorability given the
  * covariates — the standard cross-sectional fallback.
  *
  * Scale shape: the propensity is one [[Glm.logistic]] fit (one
  * aggregate pass per IRLS step); the outcome models are [[Ols]] fits
  * per arm sharing the same Gram machinery; the estimator itself is ONE
  * row-local scoring pass + a global mean — no shuffle beyond the
  * aggregates, nothing corpus-sized on the driver.
  */
object Causal {

  case class Ate(
      ate: Double,
      meanTreated: Double,    // weighted (Hajek) arm means for IPW; arm-mean
      meanControl: Double,    // components of the plug-in for AIPW
      n: Long,
      propensity: GlmModel
  )

  private def eCol(m: GlmModel, clip: Double): Column = {
    val mu = Glm.Binomial.mu(m.etaCol)
    least(greatest(mu, lit(clip)), lit(1.0 - clip))
  }

  /** Hajek-normalized IPW: ATE = Σ_T y/e ⁄ Σ_T 1/e − Σ_C y/(1−e) ⁄ Σ_C 1/(1−e).
    * The normalization makes the estimate invariant to propensity
    * miscalibration by a constant and bounds it inside the observed y
    * range; `clip` truncates extreme propensities (positivity guard —
    * at 100 TB a handful of e ≈ 0 rows would otherwise own the
    * estimate).
    */
  def ipwATE(
      df: DataFrame,
      y: String,
      treat: String,
      xs: Seq[String],
      clip: Double = 0.01
  ): Ate = {
    val pm = Glm.logistic(df, treat, xs)
    val e = eCol(pm, clip)
    val t = col(treat).cast("double")
    val yc = col(y).cast("double")
    val r = df.agg(
      sum(t * yc / e).as("ty"), sum(t / e).as("tw"),
      sum((lit(1.0) - t) * yc / (lit(1.0) - e)).as("cy"),
      sum((lit(1.0) - t) / (lit(1.0) - e)).as("cw"),
      count(lit(1)).as("n")).head()
    val mt = r.getDouble(0) / r.getDouble(1)
    val mc = r.getDouble(2) / r.getDouble(3)
    Ate(mt - mc, mt, mc, r.getLong(4), pm)
  }

  /** Propensity-score stratification (Rosenbaum–Rubin 1984's
    * subclassification): fit the propensity, cut the corpus into
    * `strata` equal-count propensity bins, contrast arm means WITHIN
    * each bin, and average the per-stratum effects weighted by stratum
    * size — the transparent middle ground between the raw contrast
    * (confounded) and IPW (variance-fragile). Five subclasses remove
    * ~90% of the bias under the classic conditions.
    *
    * The equal-count cut is [[graft.ops.Rank.withGlobalNtile]] over
    * (propensity, tie id) — exact strata, NO single-partition
    * WindowExec, corpus-scale safe. Strata missing an arm are reported
    * with null ate_s and EXCLUDED from the weighted total (their
    * weight renormalized away — the standard overlap trim).
    *
    * Output: one row per stratum (stratum, n, n_treat, mean_t, mean_c,
    * ate_s 6dp) plus the overall `ate` repeated on every row
    * (strata-cardinality window — free).
    */
  def stratifiedATE(
      df: DataFrame,
      y: String,
      treat: String,
      xs: Seq[String],
      idCol: String,
      strata: Int = 5,
      clip: Double = 0.01
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pm = Glm.logistic(df, treat, xs)
    val scored = df.withColumn("__e", eCol(pm, clip))
    val cut = graft.ops.Rank.withGlobalNtile(
      scored, "stratum", strata, Seq(col("__e"), col(idCol)))
    val t = col(treat).cast("double")
    val yc = col(y).cast("double")
    val per = cut
      .groupBy(col("stratum"))
      .agg(
        count(lit(1)).as("n"),
        sum(t).cast("long").as("n_treat"),
        avg(when(t === 1.0, yc)).as("__mt"),
        avg(when(t === 0.0, yc)).as("__mc"))
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val ok = col("__mt").isNotNull && col("__mc").isNotNull
    val w = Window.partitionBy()
    per
      .withColumn("__ates", when(ok, col("__mt") - col("__mc")))
      .withColumn("ate",
        q6(sum(when(ok, (col("__mt") - col("__mc")) * col("n").cast("double"))).over(w) /
          sum(when(ok, col("n").cast("double"))).over(w)))
      .select(
        col("stratum"), col("n"), col("n_treat"),
        q6(col("__mt")).as("mean_t"), q6(col("__mc")).as("mean_c"),
        q6(col("__ates")).as("ate_s"), col("ate"))
      .orderBy("stratum")
  }

  /** Doubly-robust AIPW: consistent if EITHER the propensity OR the
    * per-arm outcome regressions are right.
    * ATE = mean[ m₁(x) − m₀(x) + T(y − m₁(x))/e − (1−T)(y − m₀(x))/(1−e) ].
    * Three fits (logistic + OLS per arm), then one row-local scoring
    * pass.
    */
  def aipwATE(
      df: DataFrame,
      y: String,
      treat: String,
      xs: Seq[String],
      clip: Double = 0.01
  ): Ate = {
    val pm = Glm.logistic(df, treat, xs)
    val t = col(treat).cast("double")
    val m1 = Ols.fit(df.where(t === 1.0), y, xs)
    val m0 = Ols.fit(df.where(t === 0.0), y, xs)
    val e = eCol(pm, clip)
    val f1 = Ols.fittedCol(m1)
    val f0 = Ols.fittedCol(m0)
    val yc = col(y).cast("double")
    val psi = f1 - f0 + t * (yc - f1) / e - (lit(1.0) - t) * (yc - f0) / (lit(1.0) - e)
    val r = df.agg(
      avg(psi).as("ate"),
      avg(f1 + t * (yc - f1) / e).as("mt"),
      avg(f0 + (lit(1.0) - t) * (yc - f0) / (lit(1.0) - e)).as("mc"),
      count(lit(1)).as("n")).head()
    Ate(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3), pm)
  }

  /** CUPED variance reduction (Deng 2013) — the experimentation-stack
    * companion to [[ipwATE]]: adjust the outcome with a PRE-period
    * covariate x (θ = cov(x,y)/var(x), y' = y − θ(x − x̄)) before the
    * treatment contrast; the difference estimate is unchanged in
    * expectation but its variance shrinks by the squared correlation —
    * the standard way to halve an A/B test's runtime with data the
    * pipeline already has. ONE aggregate pass collects every moment
    * (pooled + per-arm); all closed forms evaluate on the driver.
    * Output row: naive estimate, CUPED estimate, θ, variance-reduction
    * factor 1−ρ², per-arm counts.
    */
  def cuped(df: DataFrame, yCol: String, xCol: String, treatCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    val t = col(treatCol).cast("int")
    val r = df.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"),
      sum(t.cast("double")).as("n1"),
      sum(t.cast("double") * y).as("sy1"),
      sum(t.cast("double") * x).as("sx1")).head()
    val n = r.getDouble(0)
    val (sx, sy, sxx, sxy, syy) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    val n1 = r.getDouble(6); val sy1 = r.getDouble(7); val sx1 = r.getDouble(8)
    val n0 = n - n1
    val varX = sxx / n - (sx / n) * (sx / n)
    val covXY = sxy / n - (sx / n) * (sy / n)
    val varY = syy / n - (sy / n) * (sy / n)
    require(varX > 0 && varY > 0, "CUPED needs non-degenerate x and y")
    val theta = covXY / varX
    val rho2 = covXY * covXY / (varX * varY)
    val naive = sy1 / n1 - (sy - sy1) / n0
    // mean of y' per arm: adjusted means shift by θ·(x̄_arm − x̄)
    val adj = naive - theta * (sx1 / n1 - (sx - sx1) / n0)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n1.toLong, n0.toLong)).toDF("n_treat", "n_control")
      .withColumn("naive_est", round(lit(naive), 6))
      .withColumn("cuped_est", round(lit(adj), 6))
      .withColumn("theta", round(lit(theta), 6))
      .withColumn("var_reduction", round(lit(1.0 - rho2), 6))
  }

  /** Nearest-neighbor matching with replacement on a scalar score (the
    * matching estimator's workhorse — propensity-score matching when the
    * score is a fitted propensity, covariate matching when it's a raw
    * covariate). Each treated unit matches the control with the closest
    * score within `caliper`; ties between an equally-close lower and
    * upper neighbor go to the lower (deterministic).
    *
    * SORT-based, not join-based: the global order by (score, arm, id)
    * gives every treated row its nearest control below (last control in
    * the preceding frame) and above (first in the following frame).
    * Equal-score controls sort before treated (arm 0 < 1), so a
    * zero-distance match is always found. The order is DISTRIBUTED via
    * [[graft.ops.Rank.partitionedBySortKey]]: both IGNORE NULLS prefix
    * windows run per range-partition (`Window.partitionBy(__pid)` —
    * P-way parallel, never the single-partition WindowExec), and the
    * cross-partition carry (the last/first control of earlier/later
    * partitions) comes from a P-row collected summary scanned on the
    * driver — model state, not corpus rows. "First control after me" is
    * still computed as a GROWING prefix in descending order: a
    * shrinking (n FOLLOWING, UNBOUNDED FOLLOWING) frame re-scans the
    * partition tail per row in WindowExec — O(n²), measured 150s at
    * sf0.1 — while growing frames are incremental, O(n).
    *
    * Output, one row per MATCHED treated unit: t_id, c_id, y_t, y_c,
    * dist — raw doubles (subtractions of identical inputs are
    * bit-deterministic; no rounding needed). ATT = avg(y_t − y_c) is
    * left to the caller (order-dependent summation — see CausalSpec).
    */
  def nnMatch(
      df: DataFrame,
      idCol: String,
      treatCol: String,
      scoreCol: String,
      yCol: String,
      caliper: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val u = df.select(
      col(idCol).as("id"),
      col(treatCol).cast("int").as("tr"),
      col(scoreCol).cast("double").as("sc"),
      col(yCol).cast("double").as("y"))
    val sortKey = Seq(col("sc"), col("tr"), col("id"))
    val (marked, _) = graft.ops.Rank.partitionedBySortKey(u, sortKey)
    def ctlStruct = when(col("tr") === 0,
      struct(col("sc").as("sc"), col("id").as("id"), col("y").as("y")))

    // per-partition first/last control (P rows) -> driver prefix scan ->
    // broadcast carry-ins; struct min/max compare (sc, id) lexicographically,
    // matching the (sc, tr, id) order on the tr = 0 subset
    val summary = marked.groupBy("__pid")
      .agg(max(ctlStruct).as("lastc"), min(ctlStruct).as("firstc"))
      .orderBy("__pid")
      .collect()
    val structType = marked.select(ctlStruct.as("c")).schema("c").dataType
    val carryRows = new Array[org.apache.spark.sql.Row](summary.length)
    var prev: Any = null
    for (i <- summary.indices) {
      carryRows(i) = org.apache.spark.sql.Row(summary(i).getInt(0), prev, null)
      if (summary(i).get(1) != null) prev = summary(i).get(1)
    }
    var nxt: Any = null
    for (i <- summary.indices.reverse) {
      carryRows(i) = org.apache.spark.sql.Row(carryRows(i).get(0), carryRows(i).get(1), nxt)
      if (summary(i).get(2) != null) nxt = summary(i).get(2)
    }
    val spark = df.sparkSession
    val carry = spark.createDataFrame(
      java.util.Arrays.asList(carryRows: _*),
      StructType(Seq(
        StructField("__pid", IntegerType, nullable = false),
        StructField("cp", structType, nullable = true),
        StructField("cn", structType, nullable = true))))

    val pw = Window.partitionBy("__pid").orderBy(sortKey: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val nw = Window.partitionBy("__pid")
      .orderBy(col("sc").desc, col("tr").desc, col("id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val s = marked
      .join(broadcast(carry), Seq("__pid"))
      .withColumn("p", coalesce(last(ctlStruct, ignoreNulls = true).over(pw), col("cp")))
      .withColumn("nx", coalesce(last(ctlStruct, ignoreNulls = true).over(nw), col("cn")))
      .withColumn("psc", col("p.sc")).withColumn("pid", col("p.id"))
      .withColumn("py", col("p.y"))
      .withColumn("nsc", col("nx.sc")).withColumn("nid", col("nx.id"))
      .withColumn("ny", col("nx.y"))
    val usePrev = col("psc").isNotNull &&
      (col("nsc").isNull || (col("sc") - col("psc")) <= (col("nsc") - col("sc")))
    s.where(col("tr") === 1)
      .withColumn("c_id", when(usePrev, col("pid")).otherwise(col("nid")))
      .withColumn("y_c", when(usePrev, col("py")).otherwise(col("ny")))
      .withColumn("dist", when(usePrev, col("sc") - col("psc")).otherwise(col("nsc") - col("sc")))
      .where(col("c_id").isNotNull && col("dist") <= caliper)
      .select(col("id").as("t_id"), col("c_id"), col("y").as("y_t"), col("y_c"), col("dist"))
  }

  /** Quantile treatment effects — the distributional readout the mean
    * ATE hides: QTE(τ) = Q_T(τ) − Q_C(τ) per quantile. Exact
    * interpolating percentiles per arm (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the q17 bridge) in ONE aggregate (null-skipping
    * conditional columns — no per-arm scans), reshaped to one row per
    * τ on the single aggregate row. Degenerate arms (empty) yield null
    * quantiles. NOTE: these are distribution differences, not
    * individual-effect quantiles — the standard caveat, documented.
    */
  def qte(
      df: DataFrame,
      yCol: String,
      treatCol: String,
      taus: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)): DataFrame = {
    require(taus.nonEmpty && taus.forall(t => t > 0 && t < 1), "qte: taus in (0,1)")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val t = col(treatCol).cast("int")
    val yc = col(yCol).cast("double")
    val aggs = taus.zipWithIndex.flatMap { case (tau, i) =>
      Seq(
        percentile(when(t === 1, yc), lit(tau)).as(s"qt_$i"),
        percentile(when(t === 0, yc), lit(tau)).as(s"qc_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)
    taus.zipWithIndex.map { case (tau, i) =>
      one.select(
        lit(tau).as("tau"),
        q6(col(s"qt_$i")).as("q_treat"),
        q6(col(s"qc_$i")).as("q_control"),
        q6(col(s"qt_$i") - col(s"qc_$i")).as("qte"))
    }.reduce(_ unionAll _)
  }

  /** Covariate balance table — the love-plot data behind every IPW /
    * matching analysis: for each covariate, arm means and the
    * standardized mean difference BEFORE weighting and AFTER IPW
    * weighting (treated 1/e, control 1/(1−e), e clipped to
    * [clip, 1−clip] — the [[ipwATE]] positivity guard). |SMD| < 0.1
    * post-weighting is the conventional "balanced" bar.
    *
    * `propCol` is a propensity COLUMN (caller-supplied — a fitted
    * [[graft.ml.Glm.logistic]] score via `etaCol`, or any deterministic
    * score), so the whole table is closed-form replayable. One
    * corpus aggregate computes every covariate's ten moments
    * map-side-combined; the per-covariate reshape happens on the
    * resulting ONE-row frame (k unions of a cached single row — free).
    * Variances are population-style second moments (Σx²/n − μ²; the
    * documented convention, weighted identically), SMD divides by
    * √((v_t+v_c)/2) and is null when both variances are 0.
    */
  /** Sharp regression discontinuity (Thistlethwaite–Campbell 1960;
    * Imbens–Lemieux 2008 local-linear form): treatment switches on at
    * `cutoff` of the running variable, and the effect is the jump of
    * the outcome's conditional expectation there — estimated by TWO
    * local-linear regressions (one per side) over |r − c| ≤ h with
    * triangular kernel weights w = 1 − |r − c|/h, τ = â_right − â_left
    * (the weighted intercepts AT the cutoff, since both sides regress
    * on the centered running variable r − c).
    *
    * Scale shape: one filtered pass computes BOTH sides' five weighted
    * moments in a single conditional aggregate (side indicator folded
    * arithmetically); the two 2×2 solves are driver closed forms.
    * Returns one row: tau, per-side intercepts/slopes, per-side n
    * (6dp floor-quantized floats). Bandwidth choice is the caller's
    * (IK/CCT selectors are out of scope — h is an explicit argument,
    * never silently derived).
    */
  def rdd(
      df: DataFrame,
      yCol: String,
      runningCol: String,
      cutoff: Double,
      bandwidth: Double): DataFrame = {
    require(bandwidth > 0, "Causal.rdd: bandwidth must be positive")
    val spark = df.sparkSession
    val r = col(runningCol).cast("double") - lit(cutoff)
    val y = col(yCol).cast("double")
    val w = lit(1.0) - abs(r) / lit(bandwidth)
    // side indicator as arithmetic weights (the Tobit blend lesson):
    // right = r >= 0 (treated side, cutoff inclusive — the sharp-RD
    // convention), left = r < 0
    val right = (r >= 0).cast("double")
    val left = lit(1.0) - right
    def side(s: Column, p: String) = Seq(
      sum(s * w).as(s"${p}w"),
      sum(s * w * r).as(s"${p}wx"),
      sum(s * w * r * r).as(s"${p}wxx"),
      sum(s * w * y).as(s"${p}wy"),
      sum(s * w * r * y).as(s"${p}wxy"),
      sum(s).cast("long").as(s"${p}n"))
    val aggs = side(left, "l") ++ side(right, "r")
    val row = df.where(abs(r) <= bandwidth).agg(aggs.head, aggs.tail: _*).head()
    def fit(p: String): (Double, Double, Long) = {
      val sw = row.getAs[Double](s"${p}w"); val swx = row.getAs[Double](s"${p}wx")
      val swxx = row.getAs[Double](s"${p}wxx"); val swy = row.getAs[Double](s"${p}wy")
      val swxy = row.getAs[Double](s"${p}wxy"); val n = row.getAs[Long](s"${p}n")
      val det = sw * swxx - swx * swx
      require(n >= 3 && det > 0,
        s"Causal.rdd: side '$p' needs >= 3 in-bandwidth points with running variation")
      val b = (sw * swxy - swx * swy) / det
      val a = (swy - b * swx) / sw
      (a, b, n)
    }
    val (aL, bL, nL) = fit("l")
    val (aR, bR, nR) = fit("r")
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(aR - aL), q6(aL), q6(aR), q6(bL), q6(bR), nL, nR,
      cutoff, bandwidth))
      .toDF("tau", "icept_left", "icept_right", "slope_left", "slope_right",
        "n_left", "n_right", "cutoff", "bandwidth")
  }

  def balanceTable(
      df: DataFrame,
      treat: String,
      propCol: String,
      covs: Seq[String],
      clip: Double = 0.01): DataFrame = {
    require(covs.nonEmpty, "balanceTable: need at least one covariate")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val t = col(treat).cast("double")
    val e = least(greatest(col(propCol).cast("double"), lit(clip)), lit(1.0 - clip))
    val wt = t / e                       // nonzero only on treated rows
    val wc = (lit(1.0) - t) / (lit(1.0) - e)

    val aggs: Seq[Column] = Seq(sum(t).as("nt"), sum(lit(1.0) - t).as("nc"),
      sum(wt).as("swt"), sum(wc).as("swc")) ++
      covs.zipWithIndex.flatMap { case (c, i) =>
        val x = col(c).cast("double")
        Seq(
          sum(t * x).as(s"tx_$i"), sum(t * x * x).as(s"txx_$i"),
          sum((lit(1.0) - t) * x).as(s"cx_$i"), sum((lit(1.0) - t) * x * x).as(s"cxx_$i"),
          sum(wt * x).as(s"wtx_$i"), sum(wt * x * x).as(s"wtxx_$i"),
          sum(wc * x).as(s"wcx_$i"), sum(wc * x * x).as(s"wcxx_$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*).localCheckpoint(true)

    def smdCols(name: String, sx: Column, sxx: Column, n1: Column,
        cx: Column, cxx: Column, n0: Column) = {
      val mt = sx / n1
      val mc = cx / n0
      val vt = sxx / n1 - mt * mt
      val vc = cxx / n0 - mc * mc
      // empty-arm guard first (ANSI: the vt/vc divisions must stay
      // unevaluated when an arm has no mass)
      val both = n1 > 0 && n0 > 0
      val smd = when(both && vt + vc > 0, (mt - mc) / sqrt((vt + vc) / lit(2.0)))
      (when(n1 > 0, q6(mt)), when(n0 > 0, q6(mc)), q6(smd))
    }
    covs.zipWithIndex.map { case (c, i) =>
      val (mt, mc, smd) = smdCols(c, col(s"tx_$i"), col(s"txx_$i"), col("nt"),
        col(s"cx_$i"), col(s"cxx_$i"), col("nc"))
      val (mtw, mcw, smdw) = smdCols(c, col(s"wtx_$i"), col(s"wtxx_$i"), col("swt"),
        col(s"wcx_$i"), col(s"wcxx_$i"), col("swc"))
      one.select(
        lit(c).as("covariate"),
        mt.as("mean_t"), mc.as("mean_c"), smd.as("smd"),
        mtw.as("mean_t_w"), mcw.as("mean_c_w"), smdw.as("smd_w"))
    }.reduce(_ unionAll _)
  }
}
