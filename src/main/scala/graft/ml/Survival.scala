package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Rank

/** Kaplan–Meier survival estimation — right-censored time-to-event, the
  * nonparametric companion to the [[Glm.Cloglog]] discrete-time-hazard
  * GLM: S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event times, where
  * nᵢ is the at-risk count (everyone with duration ≥ tᵢ) and dᵢ the
  * events at tᵢ. Censored subjects leave the risk set without
  * contributing an event — dropping them instead (the naive mistake)
  * biases survival DOWN.
  *
  * Scale shape: the corpus collapses to one (duration) count aggregate
  * (events, censored); the risk set and the cumulative ln-survival are
  * then DISTRIBUTED prefix/suffix sums over the distinct-duration frame
  * via [[graft.ops.Rank.withPrefixSums]] — a range exchange +
  * per-partition windows + a P-row carry, NEVER a single-partition
  * WindowExec. With integer-day durations the frame is
  * duration-cardinality; with continuous (ms) durations distinct t ≈ n
  * and the distributed scan is what keeps the family viable at corpus
  * scale (the hazard [[graft.ops.Rank]] names).
  */
object Survival {

  private def q6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)

  /** (t, d, c, n_risk) per distinct duration. n_risk (everyone with
    * duration ≥ t) is the suffix count, computed as
    * total − prefix_exclusive from ONE ascending distributed prefix
    * pass — integer arithmetic end-to-end, bit-exact.
    */
  private def riskCounts(
      df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val counts = df
      .groupBy(col(durationCol).cast("double").as("t"))
      .agg(
        sum(col(eventCol).cast("int")).cast("long").as("d"),
        sum(lit(1) - col(eventCol).cast("int")).cast("long").as("c"))
      .withColumn("at", col("d") + col("c"))
    Rank.withPrefixSums(counts, Seq(col("t")), Seq("at"))
      .withColumn("n_risk", col("__tot_at") - col("__cum_at") + col("at"))
      .drop("at", "__cum_at", "__tot_at")
  }

  /** ln(1 − d/n) with the 1e-300 floor that keeps ln finite when
    * d = n_risk (everyone at the last time dies): survival rounds to
    * exactly 0 on both engines instead of tripping ln(0).
    */
  private def lnTerm: Column =
    when(col("d") > 0,
      log(greatest(
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"),
        lit(1e-300))))
      .otherwise(lit(0.0))

  /** (t, n_risk, d_events, n_censored, survival) per distinct duration,
    * survival 6dp, ordered by t.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val risk = riskCounts(df, durationCol, eventCol).withColumn("ln_term", lnTerm)
    Rank.withPrefixSums(risk, Seq(col("t")), Seq("ln_term"))
      // house floor-quantizer (NOT round): floor(x·1e6 + 0.5)/1e6 is
      // bit-stable across engines where round()'s midpoint handling is not
      .withColumn("survival", q6(exp(col("__cum_ln_term"))))
      .select(
        col("t"), col("n_risk"), col("d").as("d_events"), col("c").as("n_censored"),
        col("survival"))
      .orderBy(col("t"))
  }

  /** τ-restricted mean survival time — the clinically-standard scalar
    * summary of a KM curve when medians are undefined (heavy
    * censoring): RMST(τ) = ∫₀^τ Ŝ(t)dt, the exact area under the step
    * function, in the drop form that needs NO lead/lag window:
    * area = τ − Σ_{tᵢ ≤ τ} (Ŝ(tᵢ₋₁) − Ŝ(tᵢ))·(τ − tᵢ), with Ŝ(t₀)=1.
    * Ŝ(tᵢ₋₁) comes from the EXCLUSIVE prefix of the ln-terms (the
    * `__excl_` column of the same scan), accumulated in the same order
    * as the inclusive sum — NOT as q6(exp(cum − ln_term)): (a+b)−b ≠ a
    * in floats, and a drop straddling a 1e-6 quantization boundary
    * would detach rmst from the telescoped KM-frame area by ~1e-6.
    * Both survivals carry the same 6dp pointwise quantization as
    * [[kaplanMeier]] (ulp-level regrouping between engines is still
    * possible at a boundary — the house float contract, not an
    * exactness guarantee). One distributed prefix pass + one plain
    * aggregate. Returns one row: (tau, rmst 6dp).
    */
  def rmst(df: DataFrame, durationCol: String, eventCol: String, tau: Double): DataFrame = {
    require(tau > 0, "Survival.rmst: tau must be positive")
    val risk = riskCounts(df, durationCol, eventCol).withColumn("ln_term", lnTerm)
    val cum = Rank.withPrefixSums(risk, Seq(col("t")), Seq("ln_term"),
        exclusive = Seq("ln_term"))
      .withColumn("s", q6(exp(col("__cum_ln_term"))))
      .withColumn("s_prev", q6(exp(col("__excl_ln_term"))))
    cum
      .agg(
        q6(lit(tau) - coalesce(
          sum(when(col("t") <= tau,
            (col("s_prev") - col("s")) * (lit(tau) - col("t")))
            .otherwise(lit(0.0))),
          lit(0.0))).as("rmst"))
      .select(lit(tau).as("tau"), col("rmst"))
  }

  /** Competing-risks cumulative incidence (Aalen–Johansen, K causes):
    * CIF_k(t) = Σ_{s≤t} Ŝ(s⁻)·d_k(s)/n(s), where Ŝ(s⁻) is the
    * all-cause KM survival JUST BEFORE s (exclusive prefix of the
    * [[kaplanMeier]] ln-terms). 1 − Σ_k CIF_k(∞) is the censoring-
    * respecting "still event-free" mass — naive per-cause KM
    * over-counts when risks compete; this is the standard fix.
    * `causeCol`: 0 = censored, ≥ 1 = event causes. Same distributed
    * duration-frame scans as [[kaplanMeier]]; the per-cause cumulative
    * rides ONE (cause, t)-ordered distributed prefix pass with a
    * per-cause base subtracted (terms are ≥ 0, so the base is the
    * minimum exclusive prefix within the cause) — never a
    * single-partition-per-cause sequential window. Returns one row
    * per (t, cause): n_risk, d_cause, s_minus, cif (6dp), t-ascending.
    */
  def cumulativeIncidence(
      df: DataFrame,
      durationCol: String,
      causeCol: String): DataFrame = {
    val base = df.select(
      col(durationCol).cast("double").as("t"),
      col(causeCol).cast("int").as("cause"))
    val perT = base
      .groupBy("t")
      .agg(
        count(lit(1)).as("at"),
        sum(when(col("cause") > 0, 1).otherwise(0)).cast("long").as("d"))
    val withRisk = Rank.withPrefixSums(perT, Seq(col("t")), Seq("at"))
      .withColumn("n_risk", col("__tot_at") - col("__cum_at") + col("at"))
      .drop("__cum_at", "__tot_at")
      .withColumn("ln_term", lnTerm)
    val tFrame = Rank.withPrefixSums(withRisk, Seq(col("t")), Seq("ln_term"))
      .withColumn("s_minus", exp(col("__cum_ln_term") - col("ln_term")))
      .select(col("t"), col("n_risk"), col("s_minus"))
    val perTC = base
      .where(col("cause") > 0)
      .groupBy("t", "cause")
      .agg(count(lit(1)).as("d_cause"))
      .join(tFrame, Seq("t"))
      .withColumn("term",
        col("s_minus") * col("d_cause").cast("double") / col("n_risk").cast("double"))
    val cum = Rank.withPrefixSums(perTC, Seq(col("cause"), col("t")), Seq("term"))
    // per-cause base = the global cumulative just before the cause's
    // first row; terms are non-negative, so min(cum − term) within the
    // cause is exactly that boundary value (a K-row aggregate, broadcast)
    val bases = cum.groupBy("cause")
      .agg(min(col("__cum_term") - col("term")).as("__base"))
    cum
      .join(broadcast(bases), Seq("cause"))
      .withColumn("cif", q6(col("__cum_term") - col("__base")))
      .select(col("t"), col("cause"), col("n_risk"), col("d_cause"),
        q6(col("s_minus")).as("s_minus"), col("cif"))
      .orderBy(col("t"), col("cause"))
  }

  /** [[kaplanMeier]] plus the Greenwood (1926) standard error and the
    * plain z confidence band clamped to [0, 1]:
    * Var Ŝ(t) = Ŝ(t)² Σ_{tᵢ≤t} dᵢ/(nᵢ(nᵢ−dᵢ)). Terminal times where
    * everyone dies (d = n) get se = 0 by the S = 0 convention (their
    * Greenwood term is skipped — S² · ∞ reads as 0 here, matching every
    * survival package). Same distributed duration-frame shape; the
    * Greenwood sum shares the ln-term prefix pass.
    */
  def kaplanMeierCI(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      z: Double = 1.959964): DataFrame = {
    val risk = riskCounts(df, durationCol, eventCol)
      .withColumn("ln_term", lnTerm)
      .withColumn("gw_term",
        when(col("d") > 0 && col("n_risk") > col("d"),
          col("d").cast("double") /
            (col("n_risk").cast("double") * (col("n_risk") - col("d")).cast("double")))
          .otherwise(lit(0.0)))
    Rank.withPrefixSums(risk, Seq(col("t")), Seq("ln_term", "gw_term"))
      .withColumn("surv_raw", exp(col("__cum_ln_term")))
      .withColumn("se_raw", col("surv_raw") * sqrt(col("__cum_gw_term")))
      .select(
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
    * [[kaplanMeier]]: one duration count aggregate + distributed
    * prefix/suffix scans — distinct-duration rows only, never corpus
    * rows, never a single-partition window.
    */
  def nelsonAalen(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val risk = riskCounts(df, durationCol, eventCol)
      .withColumn("haz_term",
        col("d").cast("double") / col("n_risk").cast("double"))
    Rank.withPrefixSums(risk, Seq(col("t")), Seq("haz_term"))
      .withColumn("cum_hazard", col("__cum_haz_term"))
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
    * ONE distributed prefix pass yielding both at-risk suffix counts
    * (integer-exact), one final reduction. All counts are integers;
    * only the E/V arithmetic is float.
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
    val risk = Rank.withPrefixSums(counts, Seq(col("t")), Seq("tot", "tot1"))
      .withColumn("nj", col("__tot_tot") - col("__cum_tot") + col("tot"))
      .withColumn("n1j", col("__tot_tot1") - col("__cum_tot1") + col("tot1"))
      .where(col("d") > 0 && col("nj") > 1)
    val p1 = col("n1j").cast("double") / col("nj").cast("double")
    val e = col("d").cast("double") * p1
    val v = col("d").cast("double") * p1 * (lit(1.0) - p1) *
      (col("nj") - col("d")).cast("double") / (col("nj") - 1).cast("double")
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
