package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbtestEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("Abtest.permutationTest: planted effect rejects, null effect doesn't; sizes preserved") {
    import org.apache.spark.sql.functions.{col, when}
    // strong effect: arm A units at 10, arm B units at 0 — only the
    // identity-composition permutation reaches the observed separation
    val strong = (1 to 40).map(u => (u.toLong, if (u % 2 == 0) 10.0 else 0.0))
      .flatMap { case (u, y) => Seq((u, y), (u, y)) } // two events per unit
      .toDF("u", "y")
    val arm = when(col("u") % 2 === 0, "A").otherwise("B")
    val r = Abtest.permutationTest(strong, "u", "y", arm, reps = 99).head()
    assert(r.getAs[Long]("n_a") === 20L && r.getAs[Long]("n_b") === 20L)
    assert(r.getAs[Double]("obs_diff") === 10.0)
    // no permutation should reach the observed separation
    assert(r.getAs[Long]("n_ge") === 0L)
    assert(r.getAs[Double]("p_value") === math.floor(1.0 / 100.0 * 1e6 + 0.5) / 1e6)

    // pure noise: p should be comfortably non-significant
    val nullDf = (1 to 40).map(u => (u.toLong, (u * 37 % 11).toDouble)).toDF("u", "y")
    val rn = Abtest.permutationTest(nullDf, "u", "y", arm, reps = 99).head()
    assert(rn.getAs[Double]("p_value") > 0.05)

    // reproducible: same seed, same n_ge
    val rn2 = Abtest.permutationTest(nullDf, "u", "y", arm, reps = 99).head()
    assert(rn2.getAs[Long]("n_ge") === rn.getAs[Long]("n_ge"))
  }

  test("Abtest.twoProportion: hand z, lift, and SRM on planted counts") {
    // A: 1000 users, 100 conversions; B: 1100 users, 143 conversions
    val rows = Seq.fill(100)(("A", true)) ++ Seq.fill(900)(("A", false)) ++
      Seq.fill(143)(("B", true)) ++ Seq.fill(957)(("B", false))
    val df = rows.toDF("v", "s")
    val r = Abtest.twoProportion(df, col("v"), col("s")).head()
    assert(r.getAs[Long]("n_a") === 1000L && r.getAs[Long]("conv_a") === 100L)
    assert(r.getAs[Long]("n_b") === 1100L && r.getAs[Long]("conv_b") === 143L)
    val pa = 0.1; val pb = 143.0 / 1100; val pp = 243.0 / 2100
    val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / 1000 + 1.0 / 1100))
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Double]("lift") === math.rint((pb - pa) * 1e6) / 1e6)
    val e = 2100 * 0.5
    val srm = 2 * (1050.0 - 1000) * (1050.0 - 1000) / e
    assert(math.abs(r.getAs[Double]("srm_chi2") - math.rint(srm * 1e6) / 1e6) < 1e-9)
  }

  test("Abtest.twoProportion raises on a malformed variant set") {
    val df = Seq(("A", true), ("A", false), ("C", true)).toDF("v", "s")
    val ex = intercept[Exception] {
      Abtest.twoProportion(df, col("v"), col("s")).head()
    }
    assert(ex.getMessage.contains("expected exactly variants A and B") ||
      ex.getCause != null)
  }

  test("Ewma.smooth replays the hand recurrence and flags the planted spike") {
    val ts = (1 to 6).map(i => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i"))
    // steady 10s, then a 300 spike at position 5
    val vals = Seq(10.0, 10.0, 12.0, 11.0, 300.0, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, ts(i), i.toLong, v) }
      .toDF("k", "ts", "tie", "v")
    val out = Ewma.smooth(df, "k", "ts", "tie", "v", alpha = 0.5, delta = 100.0)
      .orderBy("tie").collect()
    // hand fold, same IEEE order
    val s = vals.tail.scanLeft(vals.head)((acc, x) => 0.5 * x + 0.5 * acc)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("ewma") === math.floor(s(i) * 1e6 + 0.5) / 1e6, s"row $i")
    }
    // resid: null on first row, value - prev smoothed after
    assert(r0Null(out.head))
    assert(out(4).getAs[Double]("resid") === math.floor((300.0 - s(3)) * 1e6 + 0.5) / 1e6)
    // the spike inflates the level to 155.5, so the return-to-normal row
    // (10 − 155.5 = −145.5) flags too — the one-step-residual convention
    assert(out.map(_.getAs[Boolean]("spike")).toSeq ===
      Seq(false, false, false, false, true, true))
  }

  private def r0Null(r: org.apache.spark.sql.Row): Boolean = r.isNullAt(r.fieldIndex("resid"))

  test("Ewma.smooth folds in (ts, tie) order, not tie order alone") {
    // event ids deliberately reversed vs time: the fold must follow ts
    val ts = (1 to 3).map(i => java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0$i"))
    val df = Seq((1L, ts(0), 30L, 1.0), (1L, ts(1), 20L, 2.0), (1L, ts(2), 10L, 4.0))
      .toDF("k", "ts", "tie", "v")
    val out = Ewma.smooth(df, "k", "ts", "tie", "v", alpha = 0.5, delta = 1e9)
      .collect().map(r => r.getAs[Long]("tie") -> r.getAs[Double]("ewma")).toMap
    assert(out(30L) === 1.0)      // first in time
    assert(out(20L) === 1.5)      // 0.5*2 + 0.5*1
    assert(out(10L) === 2.75)     // 0.5*4 + 0.5*1.5
  }

  test("Abtest.probit: textbook quantiles and symmetry") {
    assert(math.abs(Abtest.probit(0.975) - 1.959963985) < 1e-7)
    assert(math.abs(Abtest.probit(0.8) - 0.8416212336) < 1e-7)
    assert(math.abs(Abtest.probit(0.5)) < 1e-9)
    assert(math.abs(Abtest.probit(0.025) + Abtest.probit(0.975)) < 1e-7)
    assert(math.abs(Abtest.probit(0.001) + 3.090232306) < 1e-6)
  }

  test("Abtest.requiredN: the classic 10% -> 12% sizing; mde inverts it") {
    // Fleiss closed form at p0=.10, p1=.12, alpha=.05, power=.8:
    // ~3835 per arm (the standard textbook neighborhood)
    val n = Abtest.requiredN(spark, 0.10, 0.02).head().getAs[Long]("n_per_arm")
    assert(n >= 3750 && n <= 3900, s"got $n")
    // round trip: the MDE at that n is ~0.02
    val m = Abtest.mde(spark, 0.10, n).head().getAs[Double]("mde")
    assert(math.abs(m - 0.02) < 5e-4, s"got $m")
    // more power -> more samples; smaller mde -> more samples
    val n9 = Abtest.requiredN(spark, 0.10, 0.02, power = 0.9).head().getAs[Long]("n_per_arm")
    assert(n9 > n)
    val nSmall = Abtest.requiredN(spark, 0.10, 0.01).head().getAs[Long]("n_per_arm")
    assert(nSmall > 3 * n)
  }

  test("requiredNContinuous: the classic sigma/mde sizing; quadruples when mde halves") {
    // n = 2*sigma^2*(1.959964 + 0.841621)^2 / mde^2; sigma=10, mde=2
    // = 2*100*7.849/4 ~ 392.4 -> 393
    val n = Abtest.requiredNContinuous(spark, sd = 10.0, mde = 2.0)
      .head().getAs[Long]("n_per_arm")
    assert(n >= 390 && n <= 396, s"n=$n")
    val nHalf = Abtest.requiredNContinuous(spark, sd = 10.0, mde = 1.0)
      .head().getAs[Long]("n_per_arm")
    assert(math.abs(nHalf - 4L * n) <= 4L, s"$nHalf vs 4x$n")
  }

  test("twoRates: hand cells, symmetry, zero-event null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arm A: 100 rows, 10 events (r=0.1); arm B: 200 rows, 40 events (r=0.2)
    val rows = (1 to 100).map(i => ("A", i <= 10)) ++ (1 to 200).map(i => ("B", i <= 40))
    val df = rows.toDF("arm", "ev")
    val r = Abtest.twoRates(df, col("arm"), col("ev"), "A", "B").head()
    assert(r.getAs[Long]("n_a") === 100L && r.getAs[Long]("x_a") === 10L)
    assert(r.getAs[Double]("rate_a") === 0.1 && r.getAs[Double]("rate_b") === 0.2)
    assert(r.getAs[Double]("diff") === 0.1)
    // z = 0.1 / sqrt(0.1/100 + 0.2/200) = 0.1/sqrt(0.002) = 2.236068
    assert(math.abs(r.getAs[Double]("z") - 2.236068) < 1e-5)
    val p = r.getAs[Double]("p_value")
    assert(p > 0.02 && p < 0.03, s"p=$p") // 2(1 - Phi(2.236)) ~ 0.0253
    // swapped arms: z flips sign, p identical
    val rSwap = Abtest.twoRates(df, col("arm"), col("ev"), "B", "A").head()
    assert(math.abs(rSwap.getAs[Double]("z") + r.getAs[Double]("z")) < 1e-9)
    assert(math.abs(rSwap.getAs[Double]("p_value") - p) < 1e-9)
    // no events anywhere -> null z and p, rates 0
    val quiet = (1 to 50).map(i => (if (i % 2 == 0) "A" else "B", false)).toDF("arm", "ev")
    val rq = Abtest.twoRates(quiet, col("arm"), col("ev"), "A", "B").head()
    assert(rq.isNullAt(rq.fieldIndex("z")) && rq.isNullAt(rq.fieldIndex("p_value")))
  }

  test("effectSize: hand Cohen's d / Hedges' g; zero-variance null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A {1,2,3} (mean 2, ss 2), B {3,4,5} (mean 4, ss 2): sp = 1, d = 2,
    // J = 1 - 3/15 = 0.8, g = 1.6, se_g = sqrt(6/9 + 1.6^2/8)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 3.0), ("B", 4.0), ("B", 5.0)).toDF("arm", "v")
    val r = Abtest.effectSize(df, col("arm"), col("v"), "A", "B").head()
    assert(r.getAs[Double]("cohens_d") === 2.0)
    assert(math.abs(r.getAs[Double]("hedges_g") - 1.6) < 1e-9)
    val seg = math.sqrt(6.0 / 9.0 + 1.6 * 1.6 / 8.0)
    assert(math.abs(r.getAs[Double]("g_lo") - (1.6 - 1.959964 * seg)) < 1e-6)
    assert(math.abs(r.getAs[Double]("g_hi") - (1.6 + 1.959964 * seg)) < 1e-6)
    // constant outcome: d undefined, nulls not NaN
    val flat = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0)).toDF("arm", "v")
    val rf = Abtest.effectSize(flat, col("arm"), col("v"), "A", "B").head()
    assert(rf.isNullAt(rf.fieldIndex("cohens_d")))
  }

  test("BY-FDR is BH with the harmonic divisor: stricter line, nested significant set") {
    import spark.implicits._
    val tests = (1 to 40).map(i =>
      (s"g$i", if (i <= 8) i * 0.001 else 0.2 + i * 0.015)).toDF("g", "p")
    val bh = graft.ml.Diagnostics.bhFdr(tests, "p", 0.05, Seq("g"))
      .select("g", "bh_crit", "significant").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val by = graft.ml.Diagnostics.bhFdr(tests, "p", 0.05, Seq("g"), dependent = true)
      .select("g", "bh_crit", "significant").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val cm = (1 to 40).map(1.0 / _).sum
    bh.foreach { case (g, (crit, _)) =>
      assert(math.abs(by(g)._1 - crit / cm) < 1e-9, s"$g crit scaling")
    }
    // BY can only lose rejections, never add them
    by.foreach { case (g, (_, sig)) => if (sig == 1) assert(bh(g)._2 === 1, g) }
    assert(by.values.count(_._2 == 1) <= bh.values.count(_._2 == 1))
    assert(bh.values.count(_._2 == 1) === 8) // the 8 planted small p's
  }
}
