package graft.ops

import graft.SparkSpec

class AgreementSpec extends SparkSpec {
  import spark.implicits._

  test("Agreement.cohenKappa: perfect 1, independent ~0, hand 2x2, disagreement-only labels count") {
    val perfect = Seq(("k", "k"), ("d", "d"), ("k", "k")).toDF("a", "b")
    assert(Agreement.cohenKappa(perfect, "a", "b").head().getAs[Double]("kappa") === 1.0)

    // hand 2x2: cells kk=20, kd=5, dk=10, dd=15 → n=50
    // po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    val rows = Seq.fill(20)(("k", "k")) ++ Seq.fill(5)(("k", "d")) ++
      Seq.fill(10)(("d", "k")) ++ Seq.fill(15)(("d", "d"))
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Double]("p_o") === 0.7)
    assert(r.getAs[Double]("p_e") === 0.5)
    assert(math.abs(r.getAs[Double]("kappa") - 0.4) < 1e-9)

    // a label the raters NEVER agree on still carries chance mass:
    // a: x,x  b: y,y plus one (y,x) — label x in both margins, no (x,x)
    val never = Seq(("x", "y"), ("x", "y"), ("y", "x")).toDF("a", "b")
    val r2 = Agreement.cohenKappa(never, "a", "b").head()
    // margins a: x=2,y=1; b: y=2,x=1 → pe = (2*1 + 1*2)/9 = 4/9 ≠ 0
    assert(math.abs(r2.getAs[Double]("p_e") - 4.0 / 9) < 1e-6)
    assert(r2.getAs[Double]("p_o") === 0.0)
  }

  test("Agreement.partialCorr: confounder-driven correlation vanishes given z") {
    val rng = new scala.util.Random(23)
    // x and y both driven by z, no direct link: r_xy large, r_xy.z ~ 0
    val rows = (1 to 6000).map { _ =>
      val z = rng.nextGaussian()
      (2.0 * z + rng.nextGaussian() * 0.5, -1.5 * z + rng.nextGaussian() * 0.5, z)
    }
    val r = Agreement.partialCorr(rows.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(math.abs(r.getAs[Double]("r_xy")) > 0.7, "confounded marginal correlation")
    assert(math.abs(r.getAs[Double]("r_xy_given_z")) < 0.05, "should vanish given z")

    // direct link survives the partial
    val rows2 = (1 to 6000).map { _ =>
      val z = rng.nextGaussian()
      val x = z + rng.nextGaussian()
      (x, 2.0 * x + z + rng.nextGaussian() * 0.3, z)
    }
    val r2 = Agreement.partialCorr(rows2.toDF("x", "y", "z"), "x", "y", "z").head()
    assert(r2.getAs[Double]("r_xy_given_z") > 0.8)
  }

  test("cronbachAlpha: hand moments; incomplete units filtered not crashed") {
    import spark.implicits._
    // B = 2A over 4 complete units; unit 5 misses item B
    val df = Seq(
      (1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0), (4L, "A", 4.0),
      (1L, "B", 2.0), (2L, "B", 4.0), (3L, "B", 6.0), (4L, "B", 8.0),
      (5L, "A", 9.0)
    ).toDF("u", "it", "v")
    val r = Agreement.cronbachAlpha(df, "u", "it", "v").head()
    assert(r.getAs[Long]("k_items") === 2L)
    assert(r.getAs[Long]("n_units") === 5L && r.getAs[Long]("n_complete") === 4L)
    // var_A = 5/3, var_B = 20/3 -> sum 25/3 = 8.333333; tot var = 15
    assert(r.getAs[Double]("sum_var_items") === 8.333333)
    assert(r.getAs[Double]("var_total") === 15.0)
    // alpha = 2*(1 - (25/3)/15) = 2*(4/9) = 0.888889
    assert(r.getAs[Double]("alpha") === 0.888889)
  }

  test("fleissKappa: hand 2-rater cells; short items excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, "a"), (1L, "a"), // perfect agreement
      (2L, "a"), (2L, "b"), // split
      (3L, "a") // only one rating: excluded
    ).toDF("item", "cat")
    val r = Agreement.fleissKappa(df, "item", "cat", raters = 2).head()
    assert(r.getAs[Long]("n_items") === 2L)
    // P1 = 1, P2 = 0 -> p_bar = .5; p_a = 3/4, p_b = 1/4 -> Pe = .625
    assert(r.getAs[Double]("p_bar") === 0.5)
    assert(r.getAs[Double]("p_e") === 0.625)
    // kappa = (.5 - .625)/.375 = -1/3
    assert(r.getAs[Double]("kappa") === -0.333333)
  }

  test("icc: hand unbalanced-free example; separation raises ICC") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1.0), ("g1", 2.0), ("g1", 3.0),
      ("g2", 5.0), ("g2", 6.0), ("g2", 7.0)
    ).toDF("g", "v")
    val r = Agreement.icc(df, "g", "v").head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("groups") === 2L)
    // SSB = 24, SSW = 4 -> MSB 24, MSW 1, n0 = 3 -> ICC = 23/26
    assert(r.getAs[Double]("msb") === 24.0)
    assert(r.getAs[Double]("msw") === 1.0)
    assert(r.getAs[Double]("n0") === 3.0)
    assert(r.getAs[Double]("icc") === 0.884615)
    // same values shuffled into both groups: between-variance dies
    val mixed = Seq(
      ("g1", 1.0), ("g1", 7.0), ("g1", 3.0),
      ("g2", 5.0), ("g2", 2.0), ("g2", 6.0)
    ).toDF("g", "v")
    val m = Agreement.icc(mixed, "g", "v").head()
    assert(m.getAs[Double]("icc") < r.getAs[Double]("icc"))
  }

  test("blandAltman: hand bias/SD/limits; planted outlier counted outside") {
    import spark.implicits._
    // diffs 1,2,3,4: bias 2.5, var (30-25)/3 = 5/3
    val df = Seq((2.0, 1.0), (4.0, 2.0), (6.0, 3.0), (8.0, 4.0)).toDF("a", "b")
    val r = Agreement.blandAltman(df, "a", "b").head()
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Double]("bias") === 2.5)
    assert(math.abs(r.getAs[Double]("sd_diff") - math.sqrt(5.0 / 3.0)) < 1e-6)
    assert(r.getAs[Long]("n_outside") === 0L)
    // tight cloud + one wild pair: the outlier falls outside the limits
    val tight = (1 to 60).map(i => (10.0 + 0.01 * (i % 3), 10.0)) :+ (300.0, 10.0)
    val o = Agreement.blandAltman(tight.toDF("a", "b"), "a", "b").head()
    assert(o.getAs[Long]("n_outside") === 1L)
    assert(o.getAs[Double]("share_outside") > 0.0)
  }

  test("krippendorffAlpha: direct coincidence-matrix replica; binary nominal ≡ interval; edge cases") {
    import spark.implicits._
    // direct replica: ordered rating pairs per unit, weight 1/(m-1)
    def direct(rows: Seq[(String, Double)], interval: Boolean): Double = {
      val byU = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        .filter(_._2.size >= 2)
      def d(a: Double, b: Double) =
        if (interval) (a - b) * (a - b) else if (a == b) 0.0 else 1.0
      val n = byU.values.map(_.size).sum.toDouble
      var dObs = 0.0
      for ((_, vs) <- byU; i <- vs.indices; j <- vs.indices if i != j)
        dObs += d(vs(i), vs(j)) / (vs.size - 1)
      dObs /= n
      val all = byU.values.flatten.toSeq
      var dExp = 0.0
      for (a <- all; b <- all) dExp += d(a, b)
      dExp /= (n * (n - 1))
      1.0 - dObs / dExp
    }
    // 4 units, unbalanced rater counts, one unpairable unit (dropped)
    val rows = Seq(
      ("u1", 1.0), ("u1", 1.0), ("u1", 2.0),
      ("u2", 2.0), ("u2", 2.0),
      ("u3", 3.0), ("u3", 1.0), ("u3", 3.0), ("u3", 3.0),
      ("u4", 2.0))
    val df = rows.toDF("u", "v")
    for (metric <- Seq("nominal", "interval")) {
      val got = Agreement.krippendorffAlpha(df, "u", "v", metric).head()
      assert(got.getAs[Long]("n_units_used") === 3L)
      assert(got.getAs[Long]("n_ratings") === 9L)
      val want = direct(rows, interval = metric == "interval")
      assert(math.abs(got.getAs[Double]("alpha") - want) < 1e-6,
        s"$metric: got ${got.getAs[Double]("alpha")} want $want")
    }
    // binary values: nominal and interval disagreement coincide exactly
    val bin = (1 to 60).map(i => (s"u${i % 20}", (i % 3 min 1).toDouble)).toDF("u", "v")
    val an = Agreement.krippendorffAlpha(bin, "u", "v", "nominal").head().getAs[Double]("alpha")
    val ai = Agreement.krippendorffAlpha(bin, "u", "v", "interval").head().getAs[Double]("alpha")
    assert(math.abs(an - ai) < 1e-9)
    // perfect agreement -> 1; no variation at all -> null (undefined)
    val perfect = Seq(("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)).toDF("u", "v")
    assert(Agreement.krippendorffAlpha(perfect, "u", "v", "nominal")
      .head().getAs[Double]("alpha") === 1.0)
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", 5.0)).toDF("u", "v")
    val r = Agreement.krippendorffAlpha(flat, "u", "v", "interval").head()
    assert(r.isNullAt(r.fieldIndex("alpha")))
  }
}
