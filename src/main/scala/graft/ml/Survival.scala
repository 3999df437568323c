package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — right-censored time-to-event, the
  * nonparametric companion to the [[Glm.Cloglog]] discrete-time-hazard
  * GLM: S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times, where
  * nᵢ is the at-risk count (everyone with duration ≥ tᵢ) and dᵢ the
  * events at tᵢ. Censored subjects leave the risk set without
  * contributing an event — dropping them instead (the naive mistake)
  * biases survival DOWN.
  *
  * Scale shape: the corpus collapses to one (duration) count aggregate
  * (events, censored); the risk set is a SUFFIX sum and the product a
  * prefix sum of ln(1 − d/n), both windows over the DISTINCT-duration
  * frame — duration-cardinality rows, never corpus rows (the
  * [[graft.ops.Drift]] honest-cost argument).
  */
object Survival {

  /** τ-restricted mean survival time — the clinically-standard scalar
    * summary of a KM curve when medians are undefined (heavy
    * censoring): RMST(τ) = ∫₀^τ Ŝ(t)dt, the exact area under the step
    * function. Computed FROM the [[kaplanMeier]] frame (its quantized
    * survival column, so the integral is bit-replayable wherever KM
    * is): segment [0, t₁) contributes 1·min(t₁,τ); segment [tᵢ,
    * t_{i+1}) contributes Ŝ(tᵢ)·(min(t_{i+1},τ) − min(tᵢ,τ)); the tail
    * past the last event time runs at the final Ŝ until τ. One lead()
    * window + one sum over the duration-cardinality frame (the KM
    * honest-cost shape — never corpus rows). Returns one row:
    * (tau, rmst 6dp).
    */
  def rmst(df: DataFrame, durationCol: String, eventCol: String, tau: Double): DataFrame = {
    require(tau > 0, "Survival.rmst: tau must be positive")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val km = kaplanMeier(df, durationCol, eventCol)
    val w = Window.orderBy(col("t")) // duration-cardinality frame
    val seg = km
      .withColumn("t_next", coalesce(lead(col("t"), 1).over(w), lit(tau)))
      .withColumn("head_area",
        // the [0, t₁) segment at survival 1, attached to the first row
        when(lag(col("t"), 1).over(w).isNull,
          least(col("t"), lit(tau))).otherwise(lit(0.0)))
      .withColumn("seg_area",
        col("survival") *
          greatest(lit(0.0), least(col("t_next"), lit(tau)) - least(col("t"), lit(tau))))
    seg
      .agg(q6(sum(col("head_area") + col("seg_area"))).as("rmst"))
      .select(lit(tau).as("tau"), col("rmst"))
  }

  /** (t, n_risk, d_events, n_censored, survival) per distinct duration,
    * survival 6dp, ordered by t.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        sum(lit(1) - col(eventCol).cast("int")).cast("long").as("c"))

    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    counts
      .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn(
        "ln_term",
        // the 1e-300 floor keeps ln finite when d = n_risk (everyone at
        // the last time dies): survival rounds to exactly 0 on both
        // engines instead of tripping ln(0)
        when(col("d") > 0,
          log(greatest(
            lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"),
            lit(1e-300))))
          .otherwise(lit(0.0)))
      // house floor-quantizer (NOT round): floor(x·1e6 + 0.5)/1e6 is
      // bit-stable across engines where round()'s midpoint handling is not
      .withColumn(
        "survival",
        floor(exp(sum(col("ln_term")).over(wAsc)) * lit(1e6) + lit(0.5))
          .cast("double") / lit(1e6))
      .select(
        col("t"), col("n_risk"), col("d").as("d_events"), col("c").as("n_censored"),
        col("survival"))
      .orderBy(col("t"))
  }

  /** Competing-risks cumulative incidence (Aalen–Johansen, K causes):
    * CIF_k(t) = Σ_{s≤t} Ŝ(s⁻)·d_k(s)/n(s), where Ŝ(s⁻) is the
    * all-cause KM survival JUST BEFORE s (exclusive prefix of the
    * [[kaplanMeier]] ln-terms). 1 − Σ_k CIF_k(∞) is the censoring-
    * respecting "still event-free" mass — naive per-cause KM
    * over-counts when risks compete; this is the standard fix.
    * `causeCol`: 0 = censored, ≥ 1 = event causes. Same
    * duration-cardinality window frame as [[kaplanMeier]] (documented
    * convention), plus cause-KEYED cumulative windows. Returns one row
    * per (t, cause): n_risk, d_cause, s_minus, cif (6dp), t-ascending.
    */
  def cumulativeIncidence(
      df: DataFrame,
      durationCol: String,
      causeCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(durationCol).cast("double").as("t"),
      col(causeCol).cast("int").as("cause"))
    val perT = base
      .groupBy("t")
      .agg(
        count(lit(1)).as("all_t"),
        sum(when(col("cause") > 0, 1).otherwise(0)).cast("long").as("d"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tFrame = perT
      .withColumn("n_risk", sum(col("all_t")).over(wDesc))
      .withColumn("ln_term",
        when(col("d") > 0,
          log(greatest(
            lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"),
            lit(1e-300))))
          .otherwise(lit(0.0)))
      .withColumn("s_minus",
        exp(coalesce(sum(col("ln_term")).over(wExcl), lit(0.0))))
    val perTC = base
      .where(col("cause") > 0)
      .groupBy("t", "cause")
      .agg(count(lit(1)).as("d_cause"))
    val wCause = Window.partitionBy("cause").orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTC
      .join(tFrame.select(col("t"), col("n_risk"), col("s_minus")), Seq("t"))
      .withColumn("term",
        col("s_minus") * col("d_cause").cast("double") / col("n_risk").cast("double"))
      .withColumn("cif", q6(sum(col("term")).over(wCause)))
      .select(col("t"), col("cause"), col("n_risk"), col("d_cause"),
        q6(col("s_minus")).as("s_minus"), col("cif"))
      .orderBy(col("t"), col("cause"))
  }

  /** [[kaplanMeier]] plus the Greenwood (1926) standard error and the
    * plain z confidence band clamped to [0, 1]:
    * Var Ŝ(t) = Ŝ(t)² Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)). Terminal times where
    * everyone dies (d = n) get se = 0 by the S = 0 convention (their
    * Greenwood term is skipped — S² · ∞ reads as 0 here, matching every
    * survival package). Same distinct-duration window shape; one extra
    * prefix sum.
    */
  def kaplanMeierCI(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      z: Double = 1.959964): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        sum(lit(1) - col(eventCol).cast("int")).cast("long").as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q6(cc: Column) = floor(cc * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = counts
      .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn("ln_term",
        when(col("d") > 0,
          log(greatest(
            lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"),
            lit(1e-300))))
          .otherwise(lit(0.0)))
      .withColumn("gw_term",
        when(col("d") > 0 && col("n_risk") > col("d"),
          col("d").cast("double") /
            (col("n_risk").cast("double") * (col("n_risk") - col("d")).cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("surv_raw", exp(sum(col("ln_term")).over(wAsc)))
      .withColumn("se_raw", col("surv_raw") * sqrt(sum(col("gw_term")).over(wAsc)))
    base.select(
      col("t"), col("n_risk"), col("d").as("d_events"), col("c").as("n_censored"),
      q6(col("surv_raw")).as("survival"),
      q6(col("se_raw")).as("se"),
      q6(greatest(lit(0.0), col("surv_raw") - lit(z) * col("se_raw"))).as("ci_lo"),
      q6(least(lit(1.0), col("surv_raw") + lit(z) * col("se_raw"))).as("ci_hi"))
      .orderBy(col("t"))
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) —
    * Ĥ(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over distinct event times, the estimator
    * behind hazard plots and the Fleming–Harrington survival variant
    * exp(−Ĥ) (reported alongside; it dominates Kaplan–Meier's product
    * form in small risk sets). Identical scale shape to
    * [[kaplanMeier]]: one duration count aggregate, a suffix-sum
    * window for the risk set and a prefix sum of d/n — distinct-
    * duration rows only, never corpus rows.
    */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        sum(lit(1) - col(eventCol).cast("int")).cast("long").as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    counts
      .withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
      .withColumn("cum_hazard",
        sum(col("d").cast("double") / col("n_risk").cast("double")).over(wAsc))
      .select(
        col("t"), col("n_risk"), col("d").as("d_events"),
        q6(col("cum_hazard")).as("cum_hazard"),
        q6(exp(-col("cum_hazard"))).as("survival_fh"))
      .orderBy(col("t"))
  }

  /** Two-group log-rank test (Mantel 1966) — "are these two survival
    * curves the same?", the inferential companion to the descriptive KM
    * curves: at each distinct event time, group A's observed events d1j
    * vs the hypergeometric expectation E = dj·n1j/nj and variance
    * V = dj·(n1j/nj)(1−n1j/nj)(nj−dj)/(nj−1); χ²(1) = (Σ(d1j−E))²/ΣV.
    *
    * Same shape as [[kaplanMeier]]: one (t, group) count aggregate,
    * suffix-sum windows for the at-risk counts (distinct-duration
    * frame, never subject rows), one final reduction. All counts are
    * integers; only the E/V arithmetic is float.
    */
  def logRank(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      groupCol: String,
      groupA: String): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        count(lit(1)).cast("long").as("tot"),
        sum(when(col(groupCol) === groupA, col(eventCol).cast("int")).otherwise(0))
          .cast("long").as("d1"),
        sum(when(col(groupCol) === groupA, 1).otherwise(0)).cast("long").as("tot1"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = counts
      .withColumn("nj", sum(col("tot")).over(wDesc))
      .withColumn("n1j", sum(col("tot1")).over(wDesc))
      .where(col("d") > 0 && col("nj") > 1)
    val p1 = col("n1j").cast("double") / col("nj").cast("double")
    val e = col("d").cast("double") * p1
    val v = col("d").cast("double") * p1 * (lit(1.0) - p1) *
      (col("nj") - col("d")).cast("double") / (col("nj") - 1).cast("double")
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    risk
      .agg(
        sum(col("d1")).cast("long").as("o_a"),
        sum(e).as("e_a"),
        sum(col("d1").cast("double") - e).as("ome"),
        sum(v).as("vsum"))
      .select(
        col("o_a"),
        q6(col("e_a")).as("e_a"),
        q6(col("ome") * col("ome") / col("vsum")).as("chi2"))
  }
}
