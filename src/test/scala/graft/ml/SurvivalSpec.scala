package graft.ml

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook example with censoring; survival steps only at event times") {
    // durations: 1(event) 2(censored) 3(event) 4(event) 5(censored)
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0)).toDF("dur", "ev")
    val km = Survival.kaplanMeier(df, "dur", "ev").collect()
    val byT = km.map(r => r.getDouble(0) -> r).toMap
    assert(byT(1.0).getLong(1) === 5L)                       // n_risk at t=1
    assert(byT(1.0).getDouble(4) === 0.8)                    // 1 - 1/5
    assert(byT(2.0).getDouble(4) === 0.8)                    // censoring: no step
    assert(byT(2.0).getLong(3) === 1L)                       // but it IS recorded
    assert(byT(3.0).getLong(1) === 3L)                       // risk set shrank by the censored one
    assert(math.abs(byT(3.0).getDouble(4) - 0.8 * 2 / 3) < 1e-6)
    assert(math.abs(byT(4.0).getDouble(4) - 0.8 * (2.0 / 3) * 0.5) < 1e-6)
    assert(byT(5.0).getDouble(4) === byT(4.0).getDouble(4))  // final censoring: flat
    // survival is non-increasing in t
    val surv = km.sortBy(_.getDouble(0)).map(_.getDouble(4))
    assert(surv.zip(surv.drop(1)).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("kaplanMeier without censoring equals the empirical survival function; terminal 0") {
    val df = (1 to 4).map(d => (d.toDouble, 1)).toDF("dur", "ev")
    val km = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    assert(math.abs(km(1.0) - 0.75) < 1e-9)
    assert(math.abs(km(2.0) - 0.5) < 1e-9)
    assert(math.abs(km(3.0) - 0.25) < 1e-9)
    assert(km(4.0) === 0.0) // everyone at the last time dies: the ln floor path
  }

  test("nelsonAalen: textbook hazard; FH survival bounds KM from above") {
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0)).toDF("dur", "ev")
    val na = Survival.nelsonAalen(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(na(1.0).getLong(1) === 5L)
    assert(math.abs(na(1.0).getAs[Double]("cum_hazard") - 0.2) < 1e-9)          // 1/5
    assert(math.abs(na(2.0).getAs[Double]("cum_hazard") - 0.2) < 1e-9)          // censor: flat
    assert(math.abs(na(3.0).getAs[Double]("cum_hazard") - (0.2 + 1.0 / 3)) < 1e-6)
    assert(math.abs(na(4.0).getAs[Double]("cum_hazard") - (0.2 + 1.0 / 3 + 0.5)) < 1e-6)
    // Fleming-Harrington exp(-H) >= Kaplan-Meier product at every t
    val km = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r.getAs[Double]("survival")).toMap
    na.foreach { case (t, r) =>
      assert(r.getAs[Double]("survival_fh") >= km(t) - 1e-9, s"t=$t") }
  }

  test("kaplanMeierCI: Greenwood SE hand values; terminal d=n gets se 0; band clamps") {
    val df = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1), (5.0, 0)).toDF("dur", "ev")
    val km = Survival.kaplanMeierCI(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r).toMap
    // t=1: S=0.8, gw = 1/(5*4); se = 0.8*sqrt(0.05)
    assert(math.abs(km(1.0).getAs[Double]("se") - 0.8 * math.sqrt(1.0 / 20)) < 1e-6)
    // survival column identical to plain kaplanMeier
    val plain = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r.getAs[Double]("survival")).toMap
    km.foreach { case (t, r) => assert(r.getAs[Double]("survival") == plain(t), s"t=$t") }
    // bands bracket the estimate and clamp into [0,1]
    km.values.foreach { r =>
      assert(r.getAs[Double]("ci_lo") >= 0.0 && r.getAs[Double]("ci_hi") <= 1.0)
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("survival"))
      assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("survival"))
    }
    // everyone-dies-at-the-end: se 0 at the terminal time (S = 0)
    val all = (1 to 4).map(d => (d.toDouble, 1)).toDF("dur", "ev")
    val last = Survival.kaplanMeierCI(all, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(last(4.0).getAs[Double]("survival") == 0.0)
    assert(last(4.0).getAs[Double]("se") == 0.0)
  }

  test("Ols.fitStats: R-squared/AIC closed forms on a hand-checkable fit") {
    val rng = new scala.util.Random(2)
    val rows = (1 to 500).map { _ =>
      val x = rng.nextGaussian() * 3
      (2.0 + 1.5 * x + rng.nextGaussian() * 0.7, x)
    }
    val df = rows.toDF("y", "x")
    val m = Ols.fit(df, "y", Seq("x"))
    val st = Ols.fitStats(spark, m).head()
    // driver replica from raw data
    val n = rows.size.toDouble
    val (ys, xs) = (rows.map(_._1), rows.map(_._2))
    val b = m.coef
    val ssr = rows.map { case (y, x) => math.pow(y - b(0) - b(1) * x, 2) }.sum
    val sst = ys.map(y => math.pow(y - ys.sum / n, 2)).sum
    assert(math.abs(st.getAs[Double]("r2") - (1 - ssr / sst)) < 1e-5)
    assert(math.abs(st.getAs[Double]("rmse") - math.sqrt(ssr / n)) < 1e-5)
    val ll = -0.5 * n * (math.log(2 * math.Pi) + math.log(ssr / n) + 1)
    assert(math.abs(st.getAs[Double]("aic") - (2 * 3 - 2 * ll)) < 0.02)
    assert(st.getAs[Double]("adj_r2") < st.getAs[Double]("r2"))
  }

  test("dropping censored rows (the naive mistake) biases survival down vs proper KM") {
    val rows = (0 until 200).map { i =>
      val d = 1.0 + (i % 10)
      val ev = if (i % 3 == 0) 0 else 1
      (d, ev)
    }
    val df = rows.toDF("dur", "ev")
    val proper = Survival.kaplanMeier(df, "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    val naive = Survival.kaplanMeier(df.where($"ev" === 1), "dur", "ev").collect()
      .map(r => r.getDouble(0) -> r.getDouble(4)).toMap
    assert(proper(5.0) > naive(5.0), s"proper ${proper(5.0)} vs naive ${naive(5.0)}")
  }

  test("Eval.liftTable: perfect separation puts all response in the top buckets; cum_lift sane") {
    val rows = (0 until 200).map { i =>
      val score = 200 - i        // descending with i
      val label = if (i < 50) 1 else 0  // top quartile all positive
      (i.toLong, score.toDouble, label)
    }
    val df = rows.toDF("id", "s", "l")
    val lt = Eval.liftTable(df, "s", "l", Seq("id"), buckets = 4).collect()
    assert(lt.length === 4)
    val b1 = lt.find(_.getInt(0) == 1).get
    assert(b1.getLong(1) === 50L && b1.getLong(2) === 50L)
    assert(b1.getDouble(3) === 1.0)
    assert(b1.getDouble(4) === 4.0)  // base rate 0.25 -> lift 4
    assert(b1.getDouble(5) === 4.0)
    val b4 = lt.find(_.getInt(0) == 4).get
    assert(b4.getLong(2) === 0L && b4.getDouble(4) === 0.0)
    assert(math.abs(lt.find(_.getInt(0) == 4).get.getDouble(5) - 1.0) < 1e-9) // full-cum lift = 1
  }

  test("Survival.rmst: hand step-function areas; tau inside and beyond the last event") {
    import spark.implicits._
    // 4 subjects, events at t=2 (2 deaths) and t=4 (1 death), 1 censored at 4
    // KM: S(2) = 1 - 2/4 = 0.5 ; S(4) = 0.5 * (1 - 1/2) = 0.25
    val df = Seq((2.0, 1), (2.0, 1), (4.0, 1), (4.0, 0)).toDF("dur", "ev")

    // tau = 6: area = 1*[0,2) + 0.5*[2,4) + 0.25*[4,6) = 2 + 1 + 0.5
    val r6 = graft.ml.Survival.rmst(df, "dur", "ev", tau = 6.0).head()
    assert(r6.getAs[Double]("tau") === 6.0)
    assert(r6.getAs[Double]("rmst") === 3.5)

    // tau = 3 cuts inside the second segment: 1*2 + 0.5*1 = 2.5
    val r3 = graft.ml.Survival.rmst(df, "dur", "ev", tau = 3.0).head()
    assert(r3.getAs[Double]("rmst") === 2.5)

    // tau before the first event time: pure head segment
    val r1 = graft.ml.Survival.rmst(df, "dur", "ev", tau = 1.0).head()
    assert(r1.getAs[Double]("rmst") === 1.0)

    // no events at all: survival stays 1, rmst = tau
    val cens = Seq((5.0, 0), (7.0, 0)).toDF("dur", "ev")
    assert(graft.ml.Survival.rmst(cens, "dur", "ev", tau = 4.0).head()
      .getAs[Double]("rmst") === 4.0)
  }

  test("Survival family + Cox iteration plan NO unpartitioned Window (distributed prefix scans)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def unpartitioned(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
    val df = (1 to 300).map(i => (i / 3.0, i % 3 min 1, if (i % 2 == 0) "A" else "B"))
      .toDF("dur", "ev", "grp")
    assert(unpartitioned(graft.ml.Survival.kaplanMeier(df, "dur", "ev")).isEmpty)
    assert(unpartitioned(graft.ml.Survival.kaplanMeierCI(df, "dur", "ev")).isEmpty)
    assert(unpartitioned(graft.ml.Survival.nelsonAalen(df, "dur", "ev")).isEmpty)
    assert(unpartitioned(graft.ml.Survival.rmst(df, "dur", "ev", tau = 50.0)).isEmpty)
    assert(unpartitioned(
      graft.ml.Survival.logRank(df, "dur", "ev", "grp", "A")).isEmpty)
    val ci = df.withColumn("cause", (col("ev") * (lit(1) + col("dur").cast("int") % 2)).cast("int"))
    assert(unpartitioned(
      graft.ml.Survival.cumulativeIncidence(ci, "dur", "cause")).isEmpty)
    // one Cox Newton iteration's frame (the per-iteration risk-set scan)
    val base = df.select(col("dur").as("t"), col("ev"),
      (col("dur") * 0.01).as("x0")).localCheckpoint(true)
    val cum = graft.ml.Cox.iterationFrame(base, Array(0.0), 1, Seq((0, 0)))
    assert(unpartitioned(cum).isEmpty)
  }

  test("WeibullAft: planted Weibull recovery with and without censoring; exponential special case") {
    import spark.implicits._
    // T = exp(1 + 0.8x + 0.5*eps), eps = ln(-ln U) standard min-Gumbel
    def u(i: Int) = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0) max 1e-12
    val data = (0 until 4000).map { i =>
      val x = math.sin(i * 0.37) * 1.0
      val t = math.exp(1.0 + 0.8 * x + 0.5 * math.log(-math.log(1.0 - u(i))))
      (x, t)
    }
    val full = data.map { case (x, t) => (x, t, 1) }.toDF("x", "t", "d")
    val m = graft.ml.WeibullAft.fit(full, "t", "d", Seq("x"))
    assert(m.converged, s"iters ${m.iters}")
    assert(math.abs(m.beta(0) - 1.0) < 0.07, s"icept ${m.beta(0)}")
    assert(math.abs(m.beta(1) - 0.8) < 0.07, s"slope ${m.beta(1)}")
    assert(math.abs(m.sigma - 0.5) < 0.05, s"sigma ${m.sigma}")
    assert(math.abs(m.shape - 2.0) < 0.2)
    // administrative right censoring at t = 6: estimates stay close
    val cens = data.map { case (x, t) =>
      (x, math.min(t, 6.0), if (t <= 6.0) 1 else 0) }.toDF("x", "t", "d")
    val mc = graft.ml.WeibullAft.fit(cens, "t", "d", Seq("x"))
    assert(mc.converged)
    assert(mc.nEvents < mc.n) // censoring really happened
    assert(math.abs(mc.beta(1) - 0.8) < 0.1, s"censored slope ${mc.beta(1)}")
    assert(math.abs(mc.sigma - 0.5) < 0.07)
    // sigma = 1 data (exponential): shape estimate near 1
    val expo = (0 until 3000).map { i =>
      val x = math.sin(i * 0.37)
      (x, math.exp(0.5 + x + math.log(-math.log(1.0 - u(i + 7)))), 1)
    }.toDF("x", "t", "d")
    val me = graft.ml.WeibullAft.fit(expo, "t", "d", Seq("x"))
    assert(math.abs(me.shape - 1.0) < 0.1, s"shape ${me.shape}")
  }

  test("Cox distinct-duration iteration matches the per-subject formulation (hand replay)") {
    import spark.implicits._
    // small frame with TIES at t=2 and t=5 — Breslow pooling must hold
    val rows = Seq(
      (2.0, 1, 1.0), (2.0, 1, 0.0), (3.0, 0, 1.0),
      (5.0, 1, 2.0), (5.0, 1, 1.0), (7.0, 0, 0.0), (8.0, 1, 1.5))
    val df = rows.toDF("dur", "ev", "x")
    val m = graft.ml.Cox.fit(df, "dur", "ev", Seq("x"))
    // driver-side Newton on the same Breslow partial likelihood
    def scan(beta: Double): (Double, Double, Double) = {
      val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
      var (ll, g, h) = (0.0, 0.0, 0.0)
      for ((t, _) <- byT) {
        val risk = rows.filter(_._1 >= t)
        val s0 = risk.map(r => math.exp(beta * r._3)).sum
        val s1 = risk.map(r => r._3 * math.exp(beta * r._3)).sum
        val s2 = risk.map(r => r._3 * r._3 * math.exp(beta * r._3)).sum
        val evs = rows.filter(r => r._1 == t && r._2 == 1)
        ll += evs.map(e => beta * e._3 - math.log(s0)).sum
        g += evs.map(e => e._3 - s1 / s0).sum
        h += evs.size * (s2 / s0 - (s1 / s0) * (s1 / s0))
      }
      (ll, g, h)
    }
    var b = 0.0
    for (_ <- 1 to 25) { val (_, g, h) = scan(b); if (h > 0) b += g / h }
    assert(math.abs(m.beta(0) - b) < 1e-6, s"got ${m.beta(0)} want $b")
    val (llStar, _, hStar) = scan(b)
    assert(math.abs(m.loglik - llStar) < 1e-6)
    // Wald SE = 1/sqrt(information) at the MLE, replayed from the same scan
    assert(math.abs(m.se(0) - 1.0 / math.sqrt(hStar)) < 1e-6,
      s"se ${m.se(0)} vs ${1.0 / math.sqrt(hStar)}")
    assert(math.abs(m.z(0) - m.beta(0) / m.se(0)) < 1e-12)
  }
}
