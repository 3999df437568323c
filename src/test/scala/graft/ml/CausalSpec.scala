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
}
