package graft.ml

import graft.SparkSpec

class CondLogitSpec extends SparkSpec {
  import spark.implicits._

  // paired panel with group effects CORRELATED with x — the case the
  // estimator exists for: alpha_g = 2 * g-level of x, true beta = 1.5
  private def panel(n: Int): Seq[(Long, Int, Double, Double)] =
    (0 until n).flatMap { g =>
      val alpha = 2.0 * (g % 5) - 4.0
      (0 until 2).map { t =>
        val x = (g % 5).toDouble + (if (t == 0) -0.5 else 0.5) * (1 + g % 3)
        val eta = alpha + 1.5 * x
        val p = 1.0 / (1.0 + math.exp(-eta))
        // deterministic "draw": threshold a low-discrepancy phase
        val u = ((g * 2 + t) * 0.6180339887498949) % 1.0
        (g.toLong, t, x, if (u < p) 1.0 else 0.0)
      }
    }

  test("CondLogit: group effects cancel — slope near truth where pooled logit is biased") {
    val df = panel(600).toDF("g", "t", "x", "y")
    val m = CondLogit.fitPaired(df, "y", Seq("x"), "g", "t")
    assert(m.converged && m.nDiscordant > 50, s"disc=${m.nDiscordant}")
    assert(math.abs(m.coef(0) - 1.5) < 0.4, s"conditional slope ${m.coef(0)}")
    // pooled logit absorbs the correlated group effect into the slope
    val pooled = Glm.logistic(df, "y", Seq("x"))
    assert(math.abs(pooled.coef(1) - 1.5) > math.abs(m.coef(0) - 1.5),
      s"pooled ${pooled.coef(1)} must be more biased than conditional ${m.coef(0)}")
  }

  test("CondLogit: equals a no-intercept logit on hand-built differences; concordant pairs inert") {
    val df = panel(200).toDF("g", "t", "x", "y")
    val m = CondLogit.fitPaired(df, "y", Seq("x"), "g", "t")
    val rows = panel(200).groupBy(_._1).values.filter(_.size == 2)
      .map(_.sortBy(r => (r._2, r._4, r._3)))
      .filter(p => p(0)._4 != p(1)._4)
      .map(p => (p(0)._4, p(0)._3 - p(1)._3)).toSeq
    val hand = Glm.logistic(rows.toDF("z", "dx"), "z", Seq("dx"), intercept = false)
    assert(math.abs(m.coef(0) - hand.coef(0)) < 1e-12)
    assert(m.nDiscordant === hand.n)
    // appending concordant pairs changes pair counts, never the fit
    val extra = (10000 until 10050).flatMap(g =>
      Seq((g.toLong, 0, 1.0, 1.0), (g.toLong, 1, 2.0, 1.0)))
    val m2 = CondLogit.fitPaired((panel(200) ++ extra).toDF("g", "t", "x", "y"),
      "y", Seq("x"), "g", "t")
    assert(m2.coef(0) === m.coef(0) && m2.nPairs === m.nPairs + 50)
    assert(m2.nDiscordant === m.nDiscordant)
  }

  test("CondLogit: tied order column stays deterministic (orientation from the full payload)") {
    // both rows share t = 0: orientation must come from (y, x) — the
    // r12 bug class the oracle caught on the synthetic lineitem
    val df = Seq(
      (1L, 0, 0.5, 1.0), (1L, 0, 1.5, 0.0),
      (2L, 0, 0.2, 0.0), (2L, 0, 1.0, 1.0),
      (3L, 0, 2.0, 1.0), (3L, 0, 0.1, 0.0)).toDF("g", "t", "x", "y")
    val m = CondLogit.fitPaired(df, "y", Seq("x"), "g", "t")
    assert(m.nPairs === 3L && m.nDiscordant === 3L)
    // smaller (o, y, x) tuple is "first": g=1 first=(y=0? no — y rides
    // before x: (0, 1.0, 0.5) vs (0, 0.0, 1.5) -> first has y=0)
    // deterministic across partitionings:
    val m2 = CondLogit.fitPaired(df.repartition(7), "y", Seq("x"), "g", "t")
    assert(m.coef(0) === m2.coef(0))
  }

  test("CondLogit: guards — no pairs and too few discordant raise") {
    val single = Seq((1L, 0, 1.0, 1.0)).toDF("g", "t", "x", "y")
    intercept[IllegalArgumentException](
      CondLogit.fitPaired(single, "y", Seq("x"), "g", "t"))
    val concordantOnly = Seq(
      (1L, 0, 1.0, 1.0), (1L, 1, 2.0, 1.0)).toDF("g", "t", "x", "y")
    intercept[IllegalArgumentException](
      CondLogit.fitPaired(concordantOnly, "y", Seq("x"), "g", "t"))
  }
}
