package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-readout primitives: the two-proportion z-test and the
  * sample-ratio-mismatch (SRM) guard — the two checks every A/B readout
  * runs before anyone looks at a lift number. Both are closed forms over
  * one per-variant count aggregate (variant-cardinality output, never
  * row-scaled), so the whole readout is a single codegen'd pass that
  * DuckDB replays exactly. Complements the experimentation stack already
  * in place: CUPED ([[graft.ml.Causal]]), Mann-Whitney U
  * ([[graft.ml.Diagnostics]]), BH-FDR ([[Drift]]).
  */
object Abtest {

  /** Two-proportion z-test between exactly two variants, plus the SRM
    * chi-square of the observed assignment counts against the expected
    * split. One groupBy over variant (2 rows), then a driver-free pivot
    * via conditional aggregation. `expectedA` is variant A's intended
    * assignment share (0.5 for a 50/50 test).
    *
    * Output (one row): per-variant n and conversions, conversion rates,
    * absolute lift, pooled two-proportion z, and the 1-dof SRM
    * chi-square. Rates/statistics rounded to 6dp for cross-engine
    * comparison; the z sign convention is B minus A.
    */
  def twoProportion(
      df: DataFrame,
      variant: Column,
      success: Column,
      expectedA: Double = 0.5): DataFrame = {
    val per = df
      .groupBy(variant.as("v"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(success, 1L).otherwise(0L)).cast("double").as("conv"))

    val agg = per.agg(
      count(lit(1)).as("k"),
      sum(when(col("v") === "A", col("n"))).as("na0"),
      sum(when(col("v") === "A", col("conv"))).as("ca"),
      sum(when(col("v") === "B", col("n"))).as("nb"),
      sum(when(col("v") === "B", col("conv"))).as("cb"))
      .select(
        // the guard rides the n_a output expression (a pruned side
        // column would be optimized away and never evaluated)
        when(col("k") =!= 2 || col("na0").isNull || col("nb").isNull,
          raise_error(lit("Abtest.twoProportion: expected exactly variants A and B")))
          .otherwise(col("na0")).as("na"),
        col("ca"), col("nb"), col("cb"))

    val pa = col("ca") / col("na")
    val pb = col("cb") / col("nb")
    val pPool = (col("ca") + col("cb")) / (col("na") + col("nb"))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    val n = col("na") + col("nb")
    val ea = n * lit(expectedA)
    val eb = n * lit(1.0 - expectedA)
    val srm = (col("na") - ea) * (col("na") - ea) / ea + (col("nb") - eb) * (col("nb") - eb) / eb

    agg.select(
      col("na").cast("long").as("n_a"),
      col("ca").cast("long").as("conv_a"),
      col("nb").cast("long").as("n_b"),
      col("cb").cast("long").as("conv_b"),
      round(pa, 6).as("p_a"),
      round(pb, 6).as("p_b"),
      round(pb - pa, 6).as("lift"),
      round((pb - pa) / se, 6).as("z"),
      round(srm, 6).as("srm_chi2"))
  }

  /** [[twoProportion]] completed with the INFERENCE columns the plain z
    * readout leaves off: Wilson score intervals per arm (the
    * small-n-safe CI — never leaves [0,1], unlike the Wald interval)
    * and the two-sided p-value of the pooled z via the portable
    * normal CDF ([[graft.functions.NormalDist]] — identical A&S
    * polynomial on both engines, so even the p-value oracle-checks).
    * Same A/B contract and raise_error guard as [[twoProportion]].
    */
  def wilson(
      df: DataFrame,
      variant: Column,
      success: Column,
      z: Double = 1.959963984540054): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val per = df
      .groupBy(variant.as("v"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(when(success, 1L).otherwise(0L)).cast("double").as("conv"))
    val agg = per.agg(
      count(lit(1)).as("k"),
      sum(when(col("v") === "A", col("n"))).as("na0"),
      sum(when(col("v") === "A", col("conv"))).as("ca"),
      sum(when(col("v") === "B", col("n"))).as("nb"),
      sum(when(col("v") === "B", col("conv"))).as("cb"))
      .select(
        when(col("k") =!= 2 || col("na0").isNull || col("nb").isNull,
          raise_error(lit("Abtest.wilson: expected exactly variants A and B")))
          .otherwise(col("na0")).as("na"),
        col("ca"), col("nb"), col("cb"))
    val z2 = z * z
    def wilsonBounds(x: Column, n: Column): (Column, Column) = {
      val p = x / n
      val center = p + lit(z2) / (lit(2.0) * n)
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / n + lit(z2) / (lit(4.0) * n * n))
      val denom = lit(1.0) + lit(z2) / n
      ((center - half) / denom, (center + half) / denom)
    }
    val (loA, hiA) = wilsonBounds(col("ca"), col("na"))
    val (loB, hiB) = wilsonBounds(col("cb"), col("nb"))
    val pa = col("ca") / col("na")
    val pb = col("cb") / col("nb")
    val pPool = (col("ca") + col("cb")) / (col("na") + col("nb"))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
    val zStat = (pb - pa) / se
    agg.select(
      col("na").cast("long").as("n_a"),
      col("ca").cast("long").as("conv_a"),
      col("nb").cast("long").as("n_b"),
      col("cb").cast("long").as("conv_b"),
      q6(pa).as("p_a"), q6(loA).as("lo_a"), q6(hiA).as("hi_a"),
      q6(pb).as("p_b"), q6(loB).as("lo_b"), q6(hiB).as("hi_b"),
      when(se > 0, q6(zStat)).as("z"),
      when(se > 0, q6(graft.functions.NormalDist.pTwoSided(zStat))).as("p_value"))
  }

  /** Inverse standard-normal CDF — Acklam's rational approximation
    * (|rel err| < 1.15e-9 over (0,1)), the textbook public algorithm;
    * driver-side scalar for the power closed forms.
    */
  private[graft] def probit(p: Double): Double = {
    require(p > 0 && p < 1, s"probit domain (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

  /** Two-proportion experiment sizing (Fleiss): per-arm n for detecting
    * an absolute lift `mde` off baseline `p0` at two-sided `alpha` and
    * `power`, plus the companion inversion [[mde]]. Pure driver closed
    * forms emitted as a 1-row frame — the planning step before
    * [[twoProportion]] reads the experiment out.
    */
  def requiredN(
      spark: org.apache.spark.sql.SparkSession,
      p0: Double,
      mde: Double,
      alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(p0 > 0 && p0 < 1 && p0 + mde > 0 && p0 + mde < 1, "rates must stay inside (0,1)")
    require(mde != 0, "mde must be nonzero")
    val p1 = p0 + mde
    val za = probit(1 - alpha / 2)
    val zb = probit(power)
    val pbar = (p0 + p1) / 2
    // s*s, not math.pow(s, 2): the square must be the exactly-rounded
    // product so the DuckDB oracle replays n_per_arm's ceil bit-for-bit
    val s = za * math.sqrt(2 * pbar * (1 - pbar)) +
      zb * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
    val n = s * s / (mde * mde)
    import spark.implicits._
    Seq((p0, p1, alpha, power, math.ceil(n).toLong))
      .toDF("p0", "p1", "alpha", "power", "n_per_arm")
  }

  /** Per-arm n for a CONTINUOUS outcome (two-sample z/t sizing):
    * n = 2σ²(z_{α/2} + z_β)²/Δ² — the mean-metric companion of the
    * proportion sizing in [[requiredN]], same probit constants, same
    * exactly-rounded squares so the oracle replays ceil(n) bit-for-bit.
    * Returns one row: (sd, mde, alpha, power, n_per_arm).
    */
  def requiredNContinuous(
      spark: org.apache.spark.sql.SparkSession,
      sd: Double,
      mde: Double,
      alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(sd > 0, "sd must be positive")
    require(mde != 0, "mde must be nonzero")
    val za = probit(1 - alpha / 2)
    val zb = probit(power)
    val s = za + zb
    val n = 2.0 * (s * s) * (sd * sd) / (mde * mde)
    import spark.implicits._
    Seq((sd, mde, alpha, power, math.ceil(n).toLong))
      .toDF("sd", "mde", "alpha", "power", "n_per_arm")
  }

  /** Two-sample rate (count-per-exposure) z-test — the COUNT-metric
    * A/B readout beside [[twoProportion]]: arm rates r = x/n with the
    * unpooled normal approximation z = (r_b − r_a)/√(r_a/n_a + r_b/n_b)
    * (each Poisson count's rate variance is r/n), two-sided p from the
    * shared portable Φ. One conditional aggregate; every emitted float
    * is a closed form of four integers. Zero-rate-both-arms emits null
    * z/p (no information), not ±Inf.
    */
  def twoRates(
      df: DataFrame,
      armCol: Column,
      isEvent: Column,
      armA: String,
      armB: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val agg = df.agg(
      sum(when(armCol === armA, 1L).otherwise(0L)).as("n_a"),
      sum(when(armCol === armA && isEvent, 1L).otherwise(0L)).as("x_a"),
      sum(when(armCol === armB, 1L).otherwise(0L)).as("n_b"),
      sum(when(armCol === armB && isEvent, 1L).otherwise(0L)).as("x_b"))
    val ra = col("x_a").cast("double") / col("n_a").cast("double")
    val rb = col("x_b").cast("double") / col("n_b").cast("double")
    val se = sqrt(ra / col("n_a").cast("double") + rb / col("n_b").cast("double"))
    val z = (rb - ra) / se
    agg.select(
      col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      q6(ra).as("rate_a"), q6(rb).as("rate_b"),
      q6(rb - ra).as("diff"),
      when(col("x_a") + col("x_b") > 0, q6(z)).as("z"),
      when(col("x_a") + col("x_b") > 0,
        q6(graft.functions.NormalDist.pTwoSided(z))).as("p_value"))
  }

  /** Standardized effect size for a two-arm mean contrast — Cohen's d
    * with the pooled SD, plus Hedges' small-sample correction
    * g = J·d, J = 1 − 3/(4·df − 1), and the normal-approximation CI of
    * g (se² ≈ (nA+nB)/(nA·nB) + g²/(2df)). The magnitude readout the
    * raw z test omits — "significant" says nothing about HOW big. One
    * conditional moment aggregate; everything else closed forms.
    * Zero pooled variance emits nulls.
    */
  def effectSize(
      df: DataFrame,
      armCol: Column,
      valueCol: Column,
      armA: String,
      armB: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val v = valueCol.cast("double")
    val agg = df.agg(
      sum(when(armCol === armA, 1L).otherwise(0L)).as("n_a"),
      sum(when(armCol === armA, v).otherwise(lit(0.0))).as("sa"),
      sum(when(armCol === armA, v * v).otherwise(lit(0.0))).as("qa"),
      sum(when(armCol === armB, 1L).otherwise(0L)).as("n_b"),
      sum(when(armCol === armB, v).otherwise(lit(0.0))).as("sb"),
      sum(when(armCol === armB, v * v).otherwise(lit(0.0))).as("qb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val ma = col("sa") / na; val mb = col("sb") / nb
    val ssA = col("qa") - col("sa") * col("sa") / na
    val ssB = col("qb") - col("sb") * col("sb") / nb
    val dfree = na + nb - lit(2.0)
    val sp = sqrt((ssA + ssB) / dfree)
    val d = (mb - ma) / sp
    val j = lit(1.0) - lit(3.0) / (lit(4.0) * dfree - lit(1.0))
    val g = j * d
    val seg = sqrt((na + nb) / (na * nb) + g * g / (lit(2.0) * dfree))
    val okV = ssA + ssB > 0 && col("n_a") > 1 && col("n_b") > 1
    agg.select(
      col("n_a"), col("n_b"),
      q6(ma).as("mean_a"), q6(mb).as("mean_b"),
      when(okV, q6(d)).as("cohens_d"),
      when(okV, q6(g)).as("hedges_g"),
      when(okV, q6(g - lit(1.959964) * seg)).as("g_lo"),
      when(okV, q6(g + lit(1.959964) * seg)).as("g_hi"))
  }

  /** Smallest detectable absolute lift at a fixed per-arm n — the
    * monotone inversion of [[requiredN]] by bisection (driver-side, 60
    * iterations ≈ machine precision).
    */
  def mde(
      spark: org.apache.spark.sql.SparkSession,
      p0: Double,
      nPerArm: Long,
      alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(nPerArm > 1, "need nPerArm > 1")
    val za = probit(1 - alpha / 2)
    val zb = probit(power)
    def nFor(m: Double): Double = {
      val p1 = p0 + m
      val pbar = (p0 + p1) / 2
      val s = za * math.sqrt(2 * pbar * (1 - pbar)) +
        zb * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
      s * s / (m * m)
    }
    var lo = 1e-12
    var hi = 1 - p0 - 1e-12
    for (_ <- 0 until 60) {
      val mid = (lo + hi) / 2
      if (nFor(mid) > nPerArm) lo = mid else hi = mid
    }
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    Seq((p0, nPerArm, alpha, power, q6((lo + hi) / 2)))
      .toDF("p0", "n_per_arm", "alpha", "power", "mde")
  }

  /** Always-valid sequential test (mixture SPRT, Johari et al. 2017 /
    * Robbins 1970): the p-value you may peek at after EVERY event
    * without inflating false positives — the fix for the peeking
    * problem that invalidates fixed-horizon z-tests under continuous
    * monitoring. Two-sample normal-mixture form: at event n,
    * Λ_n = √(V/(V+τ²))·exp(δ²τ²/(2V(V+τ²))) with δ the running mean
    * difference, V = σ̂²(1/n_A + 1/n_B), and p_av = min(1, 1/Λ) is
    * monotone non-increasing in evidence.
    *
    * One distributed prefix scan: the six conditional cumulative sums
    * run as [[Rank.partitionedBySortKey]] two-pass prefix sums —
    * range-partition on (ts, tie), per-partition cumulative windows
    * (`Window.partitionBy(__pid)`, P-way parallel, never
    * single-partition), then broadcast per-partition carry-ins from a
    * P-row collected summary. Counts stay exact integers; the float
    * sums regroup per partition (sequential within a partition +
    * carry), which perturbs sig2 only at machine epsilon — far inside
    * the 6dp quantization. Emit every `emitEvery`-th event past
    * `minPerArm`. τ ships as the same binary64 literal to any
    * replaying engine. Degenerate evidence (all values identical →
    * bigV = 0) emits p_av = 1 rather than NaN.
    */
  def msprt(
      df: DataFrame,
      variant: Column,
      value: Column,
      tsCol: String,
      tieCol: String,
      tau: Double = 1.0,
      minPerArm: Long = 30L,
      emitEvery: Long = 500L): DataFrame = {
    val isA = variant === "A"
    val v = value.cast("double")
    // per-row terms BEFORE partitioning so the checkpoint carries them
    val pre = df
      .withColumn("__ta", when(isA, 1L).otherwise(0L))
      .withColumn("__tb", when(!isA, 1L).otherwise(0L))
      .withColumn("__va", when(isA, v).otherwise(lit(0.0)))
      .withColumn("__vb", when(!isA, v).otherwise(lit(0.0)))
      .withColumn("__qa", when(isA, v * v).otherwise(lit(0.0)))
      .withColumn("__qb", when(!isA, v * v).otherwise(lit(0.0)))
    val (marked, _) = Rank.partitionedBySortKey(pre, Seq(col(tsCol), col(tieCol)))
    val terms = Seq("__ta", "__tb", "__va", "__vb", "__qa", "__qb")
    val w = Window.partitionBy("__pid").orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-partition totals -> driver exclusive prefix -> broadcast carry
    val totals = marked.groupBy("__pid")
      .agg(count(lit(1)).as("__cn"), terms.map(t => sum(col(t)).as(t)): _*)
      .collect()
      .map(r => (r.getAs[Int]("__pid"), r.getAs[Long]("__cn"),
        terms.map(t => if (r.schema(t).dataType.typeName == "long")
          r.getAs[Long](t).toDouble else r.getAs[Double](t))))
      .sortBy(_._1)
    val spark = df.sparkSession
    import spark.implicits._
    var cn = 0L
    var acc = Array.fill(terms.size)(0.0)
    val carryRows = totals.map { case (pid, c, ts) =>
      val row = (pid, cn, acc(0).toLong, acc(1).toLong, acc(2), acc(3), acc(4), acc(5))
      cn += c
      acc = acc.zip(ts).map { case (a, t) => a + t }
      row
    }.toSeq
    val carry = carryRows.toDF(
      "__pid", "__crn", "__cna", "__cnb", "__csa", "__csb", "__cqa", "__cqb")
    val base = marked
      .join(broadcast(carry), Seq("__pid"))
      .withColumn("__rn", col("__crn") + col("__local") + 1L)
      .withColumn("na", col("__cna") + sum(col("__ta")).over(w))
      .withColumn("nb", col("__cnb") + sum(col("__tb")).over(w))
      .withColumn("sa", col("__csa") + sum(col("__va")).over(w))
      .withColumn("sb", col("__csb") + sum(col("__vb")).over(w))
      .withColumn("qa", col("__cqa") + sum(col("__qa")).over(w))
      .withColumn("qb", col("__cqb") + sum(col("__qb")).over(w))
    val nA = col("na").cast("double"); val nB = col("nb").cast("double")
    val delta = col("sb") / nB - col("sa") / nA
    val sig2 = (col("qa") - col("sa") * col("sa") / nA +
      (col("qb") - col("sb") * col("sb") / nB)) / (nA + nB - lit(2.0))
    val bigV = sig2 * (lit(1.0) / nA + lit(1.0) / nB)
    val t2 = lit(tau * tau)
    val lam = sqrt(bigV / (bigV + t2)) *
      exp(delta * delta * t2 / (lit(2.0) * bigV * (bigV + t2)))
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    base
      .where(col("na") >= minPerArm && col("nb") >= minPerArm &&
        col("__rn") % emitEvery === 0)
      .select(
        col("__rn").as("at_event"),
        col("na").as("n_a"),
        col("nb").as("n_b"),
        q6(delta).as("delta"),
        // bigV = 0 (zero within-arm variance): no evidence either way,
        // the mixture likelihood ratio is 1 -> p_av = 1, not NaN
        when(col("qa") + col("qb") - col("sa") * col("sa") / nA -
          col("sb") * col("sb") / nB <= lit(0.0), lit(1.0))
          .otherwise(q6(least(lit(1.0), lit(1.0) / lam))).as("p_av"))
  }

  /** Exact-size permutation test for a two-arm mean difference — the
    * distribution-free readout when normal-approximation SEs are
    * suspect (heavy-tailed unit metrics). Each of `reps` permutations
    * ranks units by the shared md5-60 hash of (seed, rep, unit) and
    * labels the first n_A as arm A — a uniform random permutation
    * that PRESERVES the observed arm sizes, is reproducible, and
    * replays in SQL (the [[graft.ops.Privacy]] seed-as-key contract).
    *
    * Scale shape: the corpus first collapses to the UNIT frame (one
    * row per unit — experiment-sized by definition); permutations
    * explode that to reps×units rows whose rank windows shard per
    * rep (never single-partition), then collapse to a reps-sized
    * diff frame. p = (1 + #{|diff_r| ≥ |observed|}) / (reps + 1),
    * both sides of the comparison quantized to 1e-9 so cross-engine
    * summation-order ulps cannot flip a count.
    * Returns one row: n_a, n_b, obs_diff (6dp), n_ge, p_value (6dp).
    */
  def permutationTest(
      df: DataFrame,
      unitCol: String,
      valueCol: String,
      variant: Column,
      reps: Int,
      seed: String = "graft-perm"): DataFrame = {
    require(reps > 0, "Abtest.permutationTest: reps must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    def q9(c: Column) = floor(c * lit(1e9) + lit(0.5)).cast("double") / lit(1e9)
    // unit frame: one row per unit with its mean metric and arm
    val units = df
      .groupBy(col(unitCol).as("u"))
      .agg(avg(col(valueCol).cast("double")).as("y"), first(variant).as("arm"))
      .localCheckpoint()
    val sizes = units.groupBy("arm").agg(count(lit(1)).as("n")).collect()
    require(sizes.length == 2, "Abtest.permutationTest: expected exactly two arms")
    val byArm = sizes.map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val (armA, nA) = byArm(0)
    val (_, nB) = byArm(1)
    val obs = units.groupBy("arm").agg(avg("y").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val obsDiff = obs(armA) - obs(byArm(1)._1)
    val repsDf = spark.range(1, reps + 1).toDF("rep")
    // intentional experiment-frame × reps expansion (units are
    // experiment-sized by contract; the reps side broadcasts)
    val permed = units.crossJoin(broadcast(repsDf))
      .withColumn("h", graft.functions.SharedHash.md5Long60(
        concat(lit(seed), lit("|"), col("rep").cast("string"), lit("|"), col("u").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("rep").orderBy(col("h"), col("u"))))
      .withColumn("as_a", col("rk") <= nA)
    val diffs = permed.groupBy("rep").agg(
      (sum(when(col("as_a"), col("y"))) / lit(nA.toDouble) -
        sum(when(!col("as_a"), col("y"))) / lit(nB.toDouble)).as("pdiff"))
    val nGe = diffs
      .agg(sum(when(abs(q9(col("pdiff"))) >= abs(q9(lit(obsDiff))), 1L).otherwise(0L)).as("n_ge"))
    nGe.select(
      lit(nA).as("n_a"), lit(nB).as("n_b"),
      q6(lit(obsDiff)).as("obs_diff"),
      col("n_ge"),
      q6((lit(1L) + col("n_ge")).cast("double") / lit((reps + 1).toDouble)).as("p_value"))
  }

  /** Sample-ratio-mismatch check, multi-arm and UNIT-level — the first
    * guardrail on any experiment readout (a biased assignment path
    * invalidates every downstream stat; [[twoProportion]] embeds the
    * 2-arm special case, this is the k-arm batch gate). Distinct
    * (arm, unit) pairs — a unit logged into two arms counts in both,
    * which is exactly the pathology SRM exists to surface — reduce to
    * one row per arm; expected shares broadcast; χ² GoF with dof k−1
    * repeated on every row of the arm-sized output (window over k
    * rows, corpus-independent). Arms observed outside `expected` fail
    * fast with `raise_error` (a typo'd arm name must not silently
    * skew the test).
    */
  def srm(
      df: DataFrame,
      unitCol: String,
      variant: Column,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty && math.abs(expected.map(_._2).sum - 1.0) < 1e-9,
      "Abtest.srm: expected shares must sum to 1")
    val spark = df.sparkSession
    import spark.implicits._
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val exp = expected.toDF("arm", "exp_share")
    val perArm = df.select(variant.as("arm"), col(unitCol).as("u")).distinct()
      .groupBy("arm").agg(count(lit(1)).as("n_units"))
    val joined = exp.join(perArm, Seq("arm"), "full_outer")
      .select(
        // unknown observed arm → exp_share null → fail fast on the
        // output expression (survives column pruning)
        when(col("exp_share").isNull,
          raise_error(concat(lit("Abtest.srm: unexpected arm "), col("arm"))))
          .otherwise(col("arm")).as("arm"),
        col("exp_share"),
        coalesce(col("n_units"), lit(0L)).as("n_units"))
    val w = Window.partitionBy() // k-arm frame, corpus-independent
    val tot = sum(col("n_units")).over(w).cast("double")
    val e = col("exp_share") * tot
    joined
      .withColumn("expected_units", q6(e))
      .withColumn("chi2",
        q6(sum((col("n_units") - e) * (col("n_units") - e) / e).over(w)))
      .withColumn("dof", count(lit(1)).over(w) - 1)
      .select("arm", "n_units", "expected_units", "chi2", "dof")
  }
}
