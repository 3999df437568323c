package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Panel-data estimators that sit beside the reference's pooled-OLS /
  * within-estimator pair (reference: `estimate`, hdfe/hdfe.py:49-144).
  * Econometricians run these on the SAME panels the reference targets;
  * each reduces to a transformation the cluster does in one or two
  * shuffles followed by the [[Ols]] single-pass Gram, so nothing here
  * adds a new scale regime.
  */
object Panel {

  /** Between estimator: OLS on group means. The classic companion to the
    * within estimator (their weighted combination is pooled OLS). One
    * groupBy pass collapses the facts to a frame with ONE ROW PER GROUP
    * — at 100 TB the Gram pass then runs over millions of rows, not
    * billions — and the OLS dof is the number of groups.
    */
  def between(df: DataFrame, y: String, xs: Seq[String], group: String): OlsModel = {
    val aggs = (y +: xs).map(c => avg(col(c).cast("double")).as(c))
    val means = df.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
    Ols.fit(means, y, xs)
  }

  /** First-difference estimator: regress Δy on Δx within each group,
    * ordered by `order` (pass enough columns for a TOTAL order — ties
    * would make the lag nondeterministic), no intercept (differencing
    * removes the group effect AND the common level). One shuffle
    * (window partition) then the standard Gram pass; the first row of
    * each group has no lag and is dropped.
    */
  def firstDifference(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      group: String,
      order: Seq[String]
  ): OlsModel = {
    val w = Window.partitionBy(col(group)).orderBy(order.map(col): _*)
    val diffed = df
      .select((y +: xs).map { c =>
        (col(c).cast("double") - lag(col(c).cast("double"), 1).over(w)).as(c)
      }: _*)
      .na.drop()
    Ols.fit(diffed, y, xs, intercept = false)
  }

  /** Mundlak correlated-random-effects device: augment the regression
    * with the group means of the regressors. The coefficient on each x
    * then reproduces the WITHIN estimator exactly (Mundlak 1978) — a
    * cross-pin between two different computational paths to the same
    * number. One window shuffle to attach the means, then the Gram pass.
    */
  def mundlak(df: DataFrame, y: String, xs: Seq[String], group: String): OlsModel = {
    val w = Window.partitionBy(col(group))
    val aug = xs.foldLeft(df) { (d, x) =>
      d.withColumn(s"${x}_gmean", avg(col(x).cast("double")).over(w))
    }
    Ols.fit(aug, y, xs ++ xs.map(x => s"${x}_gmean"))
  }

  /** Event-study (dynamic DiD) around staggered treatment timing: the
    * standard leads-and-lags regression
    * y_it = α_i + λ_t + Σ_{r≠−1} τ_r·1{t − E_i = r} + ε, estimated by
    * the engine's own two-way FE absorption ([[FixedEffects.fit]]), so
    * the whole thing inherits the AP/CG machinery and its scale story.
    * Relative time is clamped to [−leads, lags] (binned endpoints, the
    * standard convention); r = −1 is the omitted base period;
    * never-treated units (null `eventTime`) carry all-zero dummies and
    * identify the time effects. Returns the FeModel whose coefficients
    * are τ_r in `relOrder` order — pre-period τ̂ ≈ 0 is the
    * parallel-trends diagnostic this design exists to show.
    */
  case class EventStudy(model: FeModel, relOrder: Seq[Int])

  def eventStudy(
      df: DataFrame,
      y: String,
      unit: String,
      time: String,
      eventTime: String,
      leads: Int = 3,
      lags: Int = 3
  ): EventStudy = {
    val rels = ((-leads) to lags).filter(_ != -1)
    val rel = when(col(eventTime).isNull, lit(null))
      .otherwise(
        least(greatest(col(time).cast("long") - col(eventTime).cast("long"),
          lit(-leads.toLong)), lit(lags.toLong)))
    val withDummies = df.withColumn("__rel", rel)
    val named = rels.map(r => r -> s"__ev_${if (r < 0) "m" + (-r) else "p" + r}")
    val aug = named.foldLeft(withDummies) { case (d, (r, nm)) =>
      d.withColumn(nm, when(col("__rel") === r.toLong, 1.0).otherwise(0.0))
    }
    EventStudy(
      FixedEffects.fit(aug, y, named.map(_._2), Seq(unit, time)),
      rels)
  }

  /** 2×2 difference-in-differences from cell statistics. One aggregate
    * pass computes n / mean / sample-variance for the four
    * (treated, post) cells; the estimate
    * (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) and its
    * unequal-variance SE sqrt(Σ s²_c / n_c) are closed forms on the
    * driver. Identical to running OLS with the full interaction, but
    * with an explicit SE that DuckDB can replay exactly.
    */
  case class Did(estimate: Double, se: Double, n: Long)

  def didTwoByTwo(df: DataFrame, y: String, treated: Column, post: Column): Did = {
    val yc = col(y).cast("double")
    val cells = df
      .groupBy(treated.cast("int").as("t"), post.cast("int").as("p"))
      .agg(count(lit(1)).as("n"), avg(yc).as("m"), var_samp(yc).as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    require(cells.size == 4, s"DiD needs all four (treated, post) cells; got ${cells.keys}")
    val est = (cells((1, 1))._2 - cells((1, 0))._2) - (cells((0, 1))._2 - cells((0, 0))._2)
    val se = math.sqrt(cells.values.map { case (n, _, v) => v / n.toDouble }.sum)
    Did(est, se, cells.values.map(_._1).sum)
  }

  /** Fama–MacBeth two-pass regression (Fama & MacBeth 1973) — the
    * cross-sectional panel estimator whose SEs are robust to
    * cross-sectional correlation within a period (the failure mode
    * plain pooled OLS understates): per period t, a cross-sectional
    * slope b_t (one-regressor closed form); the estimate is the mean
    * of the b_t and its SE the time-series sd/√T. One groupBy(period)
    * moment aggregate (period-cardinality output), then a T-row
    * reduction — two shuffles total, nothing row-scaled.
    *
    * Output (one row): n_periods, b_mean, se, t_stat — floor-quantized
    * 6dp. Degenerate periods (var x = 0 or < minObs rows) are DROPPED,
    * counted in n_dropped.
    */
  def famaMacBeth(
      df: DataFrame,
      periodCol: String,
      yCol: String,
      xCol: String,
      minObs: Long = 2L): DataFrame = {
    val x = col(xCol).cast("double"); val yc = col(yCol).cast("double")
    val per = df
      .groupBy(col(periodCol).as("t"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(x).as("sx"), sum(yc).as("sy"),
        sum(x * x).as("sxx"), sum(x * yc).as("sxy"))
      .withColumn("vx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("b",
        (col("sxy") - col("sx") * col("sy") / col("n")) / col("vx"))
    val kept = per.where(col("n") >= minObs && col("vx") > 0.0)
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    kept.agg(
      count(lit(1)).as("np"),
      sum("b").as("sb"),
      sum(col("b") * col("b")).as("sbb"))
      .crossJoin(per.agg(count(lit(1)).as("n_total")))
      .select(
        col("np").cast("long").as("n_periods"),
        (col("n_total") - col("np")).cast("long").as("n_dropped"),
        q6(col("sb") / col("np")).as("b_mean"),
        q6(sqrt((col("sbb") - col("sb") * col("sb") / col("np")) /
          (col("np") - 1) / col("np"))).as("se"),
        q6((col("sb") / col("np")) /
          sqrt((col("sbb") - col("sb") * col("sb") / col("np")) /
            (col("np") - 1) / col("np"))).as("t_stat"))
  }

  /** Interrupted time series — segmented regression around a KNOWN
    * breakpoint: independent simple fits on the pre/post segments fold
    * from one regime-keyed 6-moment aggregate (the [[Diagnostics.chow]]
    * machinery pointed at EFFECT SIZES instead of the F test), and the
    * policy readout is the slope change plus the LEVEL change of the
    * two fitted lines evaluated AT the breakpoint. Degenerate segments
    * (n ≤ 2 or zero time-variance) null the fit columns. One row:
    * n_pre, n_post, slope_pre, slope_post, slope_change, level_pre,
    * level_post, level_change (6dp; levels at t = breakpoint).
    */
  def interruptedTs(
      df: DataFrame,
      tCol: String,
      yCol: String,
      breakpoint: Double): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      (col(tCol).cast("double") >= breakpoint).cast("int").as("g"),
      col(tCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    // one conditional aggregate (not a crossJoin of per-segment filters:
    // an EMPTY segment must still yield the single output row, with its
    // fit columns null)
    def segAggs(gv: Int, pfx: String): Seq[Column] = Seq(
      sum(when(col("g") === gv, 1).otherwise(0)).as(s"n_$pfx"),
      sum(when(col("g") === gv, col("x"))).as(s"sx_$pfx"),
      sum(when(col("g") === gv, col("y"))).as(s"sy_$pfx"),
      sum(when(col("g") === gv, col("x") * col("x"))).as(s"sxx_$pfx"),
      sum(when(col("g") === gv, col("x") * col("y"))).as(s"sxy_$pfx"))
    val aggs = segAggs(0, "a") ++ segAggs(1, "b")
    val one = base.agg(aggs.head, aggs.tail: _*)
    def fit(pfx: String) = {
      val n = col(s"n_$pfx").cast("double")
      val cxx = col(s"sxx_$pfx") - col(s"sx_$pfx") * col(s"sx_$pfx") / n
      val ok = col(s"n_$pfx") > 2 && cxx > 0
      val slope = (col(s"sxy_$pfx") - col(s"sx_$pfx") * col(s"sy_$pfx") / n) / cxx
      val icept = (col(s"sy_$pfx") - slope * col(s"sx_$pfx")) / n
      (ok, slope, icept + slope * lit(breakpoint))
    }
    val (okA, slA, lvA) = fit("a")
    val (okB, slB, lvB) = fit("b")
    one.select(
      col("n_a").cast("long").as("n_pre"),
      col("n_b").cast("long").as("n_post"),
      when(okA, q6(slA)).as("slope_pre"),
      when(okB, q6(slB)).as("slope_post"),
      when(okA && okB, q6(slB - slA)).as("slope_change"),
      when(okA, q6(lvA)).as("level_pre"),
      when(okB, q6(lvB)).as("level_post"),
      when(okA && okB, q6(lvB - lvA)).as("level_change"))
  }

  /** Callaway–Sant'Anna group-time ATT (2021) — staggered-adoption DiD
    * done right: with units adopting treatment at different periods,
    * one pooled two-way-FE DiD mixes already-treated units into the
    * control group and can even flip the sign (Goodman-Bacon 2021).
    * CS instead estimates a SEPARATE 2×2 per (adoption cohort g,
    * period t), always against the never-treated:
    * ATT(g,t) = [ȳ_{g,t} − ȳ_{g,g−1}] − [ȳ_{∅,t} − ȳ_{∅,g−1}],
    * anchored at the cohort's last pre-period g−1. Rows with t < g are
    * pre-trend placebos (should straddle 0); the overall ATT is the
    * cohort-size-weighted mean over post rows, reported alongside.
    *
    * Scale shape: ONE (cohort, period) mean aggregate (cells =
    * cohorts × periods, bounded — never unit rows), then broadcast
    * self-joins of the cell frame for the base-period and control
    * anchors. `gCol` = adoption period, 0 (or null → 0) = never
    * treated. Cohorts lacking their g−1 base cell, or periods missing
    * a control cell, are dropped by the inner joins (the estimator is
    * undefined there, not zero). Returns one row per (g, t):
    * (g, t, event_time, n_treated, att 6dp, att_overall 6dp — the
    * same weighted scalar repeated, null if no post rows).
    */
  def csDid(
      df: DataFrame,
      unitCol: String,
      timeCol: String,
      yCol: String,
      gCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val cells = df
      .select(
        coalesce(col(gCol).cast("long"), lit(0L)).as("g"),
        col(timeCol).cast("long").as("t"),
        col(yCol).cast("double").as("y"))
      .groupBy("g", "t")
      .agg(count(lit(1)).as("n"), (sum(col("y")) / count(lit(1))).as("m"))
    val treatedCells = cells.where(col("g") > 0)
    val treatBase = cells.where(col("g") > 0 && col("t") === col("g") - 1)
      .select(col("g"), col("m").as("m_g_base"))
    val ctrl = cells.where(col("g") === 0)
      .select(col("t"), col("m").as("m_c"))
    val ctrlBase = ctrl.select(col("t").as("__bt"), col("m_c").as("m_c_base"))
    val att = treatedCells
      .join(broadcast(treatBase), Seq("g"))
      .join(broadcast(ctrl), Seq("t"))
      .join(broadcast(ctrlBase), col("__bt") === col("g") - 1)
      .select(
        col("g"), col("t"), (col("t") - col("g")).as("event_time"),
        col("n").as("n_treated"),
        ((col("m") - col("m_g_base")) - (col("m_c") - col("m_c_base"))).as("__att"))
    // cohort-size-weighted overall ATT over post rows (event_time >= 0)
    val overall = att.where(col("event_time") >= 0)
      .agg((sum(col("n_treated") * col("__att")) /
        sum(col("n_treated"))).as("__att_overall"))
    att
      .crossJoin(broadcast(overall))
      .select(
        col("g"), col("t"), col("event_time"), col("n_treated"),
        q6(col("__att")).as("att"),
        q6(col("__att_overall")).as("att_overall"))
  }
}
