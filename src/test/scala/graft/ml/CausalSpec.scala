package graft.ml

import graft.SparkSpec

class CausalSpec extends SparkSpec {
  import spark.implicits._

  // planted confounding: x drives BOTH treatment take-up and the
  // outcome, so the naive arm contrast is biased; true effect = 1.5
  private lazy val confounded = {
    val rows = (0 until 4000).map { i =>
      val x = ((i * 0.6180339887498949) % 1.0) * 4.0 - 2.0
      val u = (i * 1.4142135623730951) % 1.0
      val p = 1.0 / (1.0 + math.exp(-1.2 * x))
      val t = if (u < p) 1.0 else 0.0
      val eps = 0.3 * math.sin(i * 1.7)
      (x, t, 2.0 + 1.5 * t + 3.0 * x + eps)
    }
    rows.toDF("x", "t", "y")
  }

  test("naive contrast is biased; IPW and AIPW both recover the planted effect") {
    val df = confounded
    val naive = {
      val r = df.groupBy("t").agg(org.apache.spark.sql.functions.avg("y")).collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      r(1.0) - r(0.0)
    }
    assert(naive - 1.5 > 0.5, s"confounding too weak to test debiasing: naive=$naive")

    val ipw = Causal.ipwATE(df, "y", "t", Seq("x"))
    assert(math.abs(ipw.ate - 1.5) < 0.2, s"ipw=${ipw.ate}")
    assert(ipw.n === 4000L)
    // Hajek bounds arm means inside the observed outcome range
    val (ymin, ymax) = {
      val r = df.agg(org.apache.spark.sql.functions.min("y"),
        org.apache.spark.sql.functions.max("y")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    assert(ipw.meanTreated > ymin && ipw.meanTreated < ymax)
    assert(ipw.meanControl > ymin && ipw.meanControl < ymax)

    val aipw = Causal.aipwATE(df, "y", "t", Seq("x"))
    assert(math.abs(aipw.ate - 1.5) < 0.1, s"aipw=${aipw.ate}")
    // double robustness in action: AIPW at least as close as IPW here
    assert(math.abs(aipw.ate - 1.5) <= math.abs(ipw.ate - 1.5) + 0.05)
  }

  test("AIPW with a CORRECT outcome model survives a broken propensity (double robustness)") {
    val df = confounded
    // clip at 0.45 wrecks the propensity (everything ≈ 0.5) — AIPW must
    // fall back on the outcome regressions, which are exactly linear
    val aipw = Causal.aipwATE(df, "y", "t", Seq("x"), clip = 0.45)
    assert(math.abs(aipw.ate - 1.5) < 0.1, s"aipw(broken e)=${aipw.ate}")
    // IPW with the same broken propensity collapses toward the naive contrast
    val ipw = Causal.ipwATE(df, "y", "t", Seq("x"), clip = 0.45)
    assert(math.abs(ipw.ate - 1.5) > 0.3, s"ipw should break here: ${ipw.ate}")
  }

  test("Causal.cuped: noiseless y = b·x gives an exactly-zero CUPED estimate and zero residual variance") {
    import spark.implicits._
    // imbalanced arms in x so the naive contrast is badly nonzero
    val rows = (0 until 200).map { i =>
      val t = if (i < 120) 1 else 0
      val x = if (t == 1) i * 0.1 else i * 0.05 + 30.0
      (x, 3.0 * x, t)
    }
    val r = Causal.cuped(rows.toDF("x", "y", "t"), "y", "x", "t").head()
    assert(math.abs(r.getAs[Double]("naive_est")) > 1.0) // contaminated contrast
    assert(math.abs(r.getAs[Double]("cuped_est")) < 1e-6) // θ=b cancels it exactly
    assert(math.abs(r.getAs[Double]("theta") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("var_reduction")) < 1e-6) // ρ² = 1
  }

  test("Causal.cuped: planted effect under noise — estimate near truth, variance reduced") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val rows = (0 until 4000).map { i =>
      val t = i % 2
      val x = rng.nextGaussian() * 2.0
      val y = 1.5 * x + 2.0 * t + rng.nextGaussian() * 0.5
      (x, y, t)
    }
    val r = Causal.cuped(rows.toDF("x", "y", "t"), "y", "x", "t").head()
    assert(math.abs(r.getAs[Double]("cuped_est") - 2.0) < 0.1)
    val vr = r.getAs[Double]("var_reduction")
    // ρ² = cov²/(var_x·var_y) ≈ 36/(4·10.25) ≈ 0.88 → 1−ρ² ≈ 0.12
    assert(vr > 0.05 && vr < 0.2, s"expected strong reduction, got $vr")
    assert(r.getAs[Long]("n_treat") === 2000L)
  }

  test("Causal.nnMatch: hand-checkable neighbors, ties to lower, caliper excludes") {
    import spark.implicits._
    // controls at scores 10, 20, 40; treated at 12 (→10), 30 (tie → 20),
    // 39 (→40), 90 (caliper-excluded)
    val df = Seq(
      (1L, 0, 10.0, 100.0), (2L, 0, 20.0, 200.0), (3L, 0, 40.0, 400.0),
      (11L, 1, 12.0, 111.0), (12L, 1, 30.0, 333.0), (13L, 1, 39.0, 399.0),
      (14L, 1, 90.0, 900.0)
    ).toDF("id", "tr", "sc", "y")
    val m = Causal.nnMatch(df, "id", "tr", "sc", "y", caliper = 20.0)
      .collect().map(r => r.getAs[Long]("t_id") ->
        ((r.getAs[Long]("c_id"), r.getAs[Double]("y_c"), r.getAs[Double]("dist")))).toMap
    assert(m(11L) === ((1L, 100.0, 2.0)))
    assert(m(12L) === ((2L, 200.0, 10.0))) // equidistant 20/40: lower wins
    assert(m(13L) === ((3L, 400.0, 1.0)))
    assert(!m.contains(14L)) // nearest is 50 away > caliper
  }

  test("Causal.nnMatch on a logit propensity debiases a planted confounded ATT") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // confounder x drives BOTH treatment assignment and outcome; true
    // effect 2. Naive diff is badly biased; matching on the fitted
    // propensity recovers ~2.
    val rows = (0L until 3000L).map { i =>
      val x = rng.nextGaussian()
      val pT = 1.0 / (1.0 + math.exp(-1.5 * x))
      val t = if (rng.nextDouble() < pT) 1 else 0
      val y = 3.0 * x + 2.0 * t + rng.nextGaussian() * 0.3
      (i, t, x, y)
    }
    val df = rows.toDF("id", "t", "x", "y")
    val prop = Glm.logistic(df, "t", Seq("x"))
    val scored = df.withColumn("e", Glm.Binomial.mu(prop.etaCol))
    val pairs = Causal.nnMatch(scored, "id", "t", "e", "y", caliper = 0.05)
    val att = pairs.agg(org.apache.spark.sql.functions.avg(
      org.apache.spark.sql.functions.col("y_t") - org.apache.spark.sql.functions.col("y_c"))).head().getDouble(0)
    val naive = {
      val a = rows.filter(_._2 == 1).map(_._4); val b = rows.filter(_._2 == 0).map(_._4)
      a.sum / a.size - b.sum / b.size
    }
    assert(math.abs(naive - 2.0) > 1.0, s"confounding should bias naive, got $naive")
    assert(math.abs(att - 2.0) < 0.4, s"matched ATT should be near 2, got $att")
  }

  test("Causal.stratifiedATE: equal-count strata debias a planted confounder") {
    val rng = new scala.util.Random(9)
    val rows = (1 to 6000).map { i =>
      val x = rng.nextGaussian()
      val t = if (rng.nextDouble() < 1.0 / (1.0 + math.exp(-1.5 * x))) 1 else 0
      val y = 2.0 * t + 3.0 * x + rng.nextGaussian() * 0.5
      (i.toLong, t, x, y)
    }
    val df = rows.toDF("id", "t", "x", "y")
    val out = Causal.stratifiedATE(df, "y", "t", Seq("x"), "id", strata = 5).collect()
    assert(out.length == 5)
    // exact ntile: stratum sizes equal (6000 / 5)
    assert(out.forall(_.getAs[Long]("n") == 1200L))
    val naive = {
      val a = rows.filter(_._2 == 1).map(_._4); val b = rows.filter(_._2 == 0).map(_._4)
      a.sum / a.size - b.sum / b.size
    }
    val ate = out.head.getAs[Double]("ate")
    assert(math.abs(naive - 2.0) > 1.0, s"naive should be confounded, got $naive")
    assert(math.abs(ate - 2.0) < 0.35, s"stratified ATE should be near 2, got $ate")
    // per-stratum rows carry consistent arm means
    out.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("ate_s")))
        assert(math.abs(r.getAs[Double]("mean_t") - r.getAs[Double]("mean_c") -
          r.getAs[Double]("ate_s")) < 2e-6)
    }
  }

  test("balanceTable: hand-checked SMD; constant covariate yields null SMD") {
    import org.apache.spark.sql.functions._
    // treated x = {2, 4}, control x = {0, 2}, e = .5 everywhere:
    // means 3 vs 1, population vars 1 and 1 -> smd = 2; weights are
    // constant so the weighted table is identical
    val df = Seq(
      (1, 0.5, 2.0, 7.0), (1, 0.5, 4.0, 7.0), (0, 0.5, 0.0, 7.0), (0, 0.5, 2.0, 7.0)
    ).toDF("t", "e0", "x", "cst")
    val got = Causal.balanceTable(df, "t", "e0", Seq("x", "cst"))
      .collect().map(r => r.getAs[String]("covariate") -> r).toMap
    val x = got("x")
    assert(x.getAs[Double]("mean_t") === 3.0 && x.getAs[Double]("mean_c") === 1.0)
    assert(x.getAs[Double]("smd") === 2.0)
    assert(x.getAs[Double]("smd_w") === 2.0)
    val c = got("cst")
    assert(c.getAs[Double]("mean_t") === 7.0 && c.getAs[Double]("mean_c") === 7.0)
    assert(c.isNullAt(c.fieldIndex("smd")) && c.isNullAt(c.fieldIndex("smd_w")))
  }

  test("balanceTable: IPW weights shrink a planted imbalance") {
    import org.apache.spark.sql.functions._
    // x drives take-up; the true propensity is handed in, so weighting
    // must close most of the raw covariate gap
    val rows = (0 until 4000).map { i =>
      val x = ((i * 0.6180339887498949) % 1.0) // uniform-ish in [0,1)
      val e = 0.2 + 0.6 * x
      val t = if (((i * 0.7548776662466927) % 1.0) < e) 1 else 0
      (t, e, x)
    }
    val df = rows.toDF("t", "e0", "x")
    val r = Causal.balanceTable(df, "t", "e0", Seq("x")).head()
    val raw = math.abs(r.getAs[Double]("smd"))
    val w = math.abs(r.getAs[Double]("smd_w"))
    assert(raw > 0.3, s"planted imbalance should be visible, raw=$raw")
    assert(w < raw / 3, s"IPW must shrink the gap: raw=$raw weighted=$w")
  }

  test("qte: constant shift moves every quantile by the shift; spread shows in the tails") {
    import org.apache.spark.sql.functions._
    val control = (1 to 99).map(i => (i.toDouble, 0))
    val shifted = (1 to 99).map(i => (i.toDouble + 10.0, 1))
    val df = (control ++ shifted).toDF("y", "t")
    val got = Causal.qte(df, "y", "t").orderBy("tau").collect()
    assert(got.length === 5)
    got.foreach(r => assert(math.abs(r.getAs[Double]("qte") - 10.0) < 1e-9))
    // median of 1..99 is exactly 50
    val med = got.find(_.getAs[Double]("tau") == 0.5).get
    assert(med.getAs[Double]("q_control") === 50.0)
    // variance treatment: doubled spread widens high quantiles, shrinks low
    val wide = (1 to 99).map(i => (50.0 + 2.0 * (i - 50.0), 1))
    val g2 = Causal.qte((control ++ wide).toDF("y", "t"), "y", "t")
      .orderBy("tau").collect()
    assert(g2.head.getAs[Double]("qte") < 0) // tau=.1
    assert(g2.last.getAs[Double]("qte") > 0) // tau=.9
  }
}
