package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for the round-9 Stats additions: Kendall τ-b, Kruskal–Wallis,
  * Jarque–Bera, McNemar, Theil–Sen, Lorenz, CMH.
  */
class Stats2Spec extends SparkSpec {
  import spark.implicits._

  // ---- Kendall τ-b ----------------------------------------------------

  test("Stats.kendallTau: perfect monotone +1, reversed -1, hand tie case") {
    val up = (1 to 8).map(i => ("g", i.toDouble, (i * 10).toDouble, i)).toDF("g", "x", "y", "i")
    val r1 = Stats.kendallTau(up, "g", "x", "y", "i").head()
    assert(r1.getAs[Double]("tau_b") === 1.0)

    val down = (1 to 8).map(i => ("g", i.toDouble, (100 - i).toDouble, i)).toDF("g", "x", "y", "i")
    val r2 = Stats.kendallTau(down, "g", "x", "y", "i").head()
    assert(r2.getAs[Double]("tau_b") === -1.0)

    // hand case with ties: x = (1,2,2,3), y = (1,3,2,4)
    // pairs (6): (1,2):C (1,2'):C (1,3):C (2,2'): x-tied (2,3):C (2',3):C
    // C=5 D=0 tied_x=1 tied_y=0 n0=6 → tau = 5/sqrt(5*6)
    val hand = Seq(("g", 1.0, 1.0, 1), ("g", 2.0, 3.0, 2), ("g", 2.0, 2.0, 3), ("g", 3.0, 4.0, 4))
      .toDF("g", "x", "y", "i")
    val r3 = Stats.kendallTau(hand, "g", "x", "y", "i").head()
    assert(r3.getAs[Long]("concordant") === 5L)
    assert(r3.getAs[Long]("discordant") === 0L)
    assert(r3.getAs[Long]("tied_x") === 1L)
    assert(r3.getAs[Long]("tied_y") === 0L)
    val expect = math.floor(5.0 / math.sqrt(5.0 * 6.0) * 1e6 + 0.5) / 1e6
    assert(r3.getAs[Double]("tau_b") === expect)
  }

  test("Stats.kendallTau groups are independent") {
    val df = ((1 to 5).map(i => ("a", i.toDouble, i.toDouble, i)) ++
      (1 to 5).map(i => ("b", i.toDouble, -i.toDouble, i))).toDF("g", "x", "y", "i")
    val m = Stats.kendallTau(df, "g", "x", "y", "i").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("tau_b")).toMap
    assert(m("a") === 1.0 && m("b") === -1.0)
  }

  // ---- Kruskal–Wallis -------------------------------------------------

  test("Stats.kruskalWallis: hand example with ties matches the textbook formula") {
    // groups: a={1,2,3}, b={4,5,6}, c={7,8,9} — fully separated
    val sep = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0),
      ("c", 7.0), ("c", 8.0), ("c", 9.0)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i) }.toDF("g", "v", "tb")
    val r = Stats.kruskalWallis(sep, "v", "g", "tb").head()
    // ranks 1..9; R_a=6, R_b=15, R_c=24; H = 12/(9*10)*(36/3+225/3+576/3) - 3*10
    val h = 12.0 / 90.0 * (36.0 / 3 + 225.0 / 3 + 576.0 / 3) - 30.0
    assert(math.abs(r.getAs[Double]("h") - math.floor(h * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Long]("k") === 3L)
    assert(r.getAs[Long]("dof") === 2L)
    // no ties → h_adj == h
    assert(r.getAs[Double]("h_adj") === r.getAs[Double]("h"))

    // tie correction: duplicate a value across groups
    val tied = Seq(("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i) }.toDF("g", "v", "tb")
    val rt = Stats.kruskalWallis(tied, "v", "g", "tb").head()
    // mid-ranks: 1, 2.5, 2.5, 4; R_a=3.5 R_b=6.5; n=4
    val hRaw = 12.0 / 20.0 * (3.5 * 3.5 / 2 + 6.5 * 6.5 / 2) - 15.0
    val corr = 1.0 - (8.0 - 2.0) / (64.0 - 4.0)
    assert(math.abs(rt.getAs[Double]("h") - math.floor(hRaw * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(math.abs(rt.getAs[Double]("h_adj") - math.floor(hRaw / corr * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  // ---- Jarque–Bera ----------------------------------------------------

  test("Stats.jarqueBera: symmetric data has 0 skew; hand moments check") {
    val sym = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", _)).toDF("g", "x")
    val r = Stats.jarqueBera(sym, "g", "x").head()
    assert(r.getAs[Double]("skewness") === 0.0)
    // m2 = 2, m4 = (16+1+0+1+16)/5 = 6.8 → kurt = 1.7
    assert(math.abs(r.getAs[Double]("kurtosis") - 1.7) < 1e-9)
    val jb = 5.0 / 6.0 * (0.0 + math.pow(1.7 - 3.0, 2) / 4.0)
    assert(math.abs(r.getAs[Double]("jb") - math.floor(jb * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("Stats.jarqueBera flags a planted heavy-tail group") {
    val normal = (1 to 200).map(i => ("even", math.sin(i * 1.7) * 2.0))
    val heavy = (1 to 200).map(i => ("heavy", if (i % 50 == 0) 80.0 else math.sin(i * 1.3)))
    val r = Stats.jarqueBera((normal ++ heavy).toDF("g", "x"), "g", "x")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("jb")).toMap
    assert(r("heavy") > 100.0 * r("even"))
  }

  // ---- McNemar --------------------------------------------------------

  test("Stats.mcnemar: hand discordant cells and continuity correction") {
    // 10 both, 5 neither, b=6 a_only, c=2 b_only → chi2 = (|6-2|-1)²/8
    val rows = Seq.fill(10)((1, 1)) ++ Seq.fill(5)((0, 0)) ++
      Seq.fill(6)((1, 0)) ++ Seq.fill(2)((0, 1))
    val r = Stats.mcnemar(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n_both") === 10L)
    assert(r.getAs[Long]("n_neither") === 5L)
    assert(r.getAs[Long]("a_only") === 6L)
    assert(r.getAs[Long]("b_only") === 2L)
    assert(r.getAs[Double]("chi2") === 9.0 / 8.0)

    // no discordant pairs → chi2 = 0, not 0/0
    val agree = Seq.fill(4)((1, 1)).toDF("a", "b")
    assert(Stats.mcnemar(agree, "a", "b").head().getAs[Double]("chi2") === 0.0)
  }

  // ---- Theil–Sen ------------------------------------------------------

  test("Stats.theilSen: exact line recovered; outlier moves OLS but not the median slope") {
    val line = (1 to 10).map(i => ("g", i.toDouble, 3.0 * i + 2.0, i)).toDF("g", "x", "y", "i")
    val r = Stats.theilSen(line, "g", "x", "y", "i").head()
    assert(r.getAs[Double]("slope") === 3.0)
    assert(r.getAs[Double]("intercept") === 2.0)

    // one wild outlier: median of pairwise slopes stays ~3
    val out = ((1 to 20).map(i => ("g", i.toDouble, 3.0 * i + 2.0, i)) :+
      (("g", 21.0, 500.0, 21))).toDF("g", "x", "y", "i")
    val r2 = Stats.theilSen(out, "g", "x", "y", "i").head()
    assert(math.abs(r2.getAs[Double]("slope") - 3.0) < 0.2)
  }

  test("Stats.theilSen skips dx=0 pairs") {
    // duplicate x values: slope defined by the remaining pairs only
    val df = Seq(("g", 1.0, 1.0, 1), ("g", 1.0, 3.0, 2), ("g", 2.0, 2.0, 3))
      .toDF("g", "x", "y", "i")
    val r = Stats.theilSen(df, "g", "x", "y", "i").head()
    assert(r.getAs[Long]("n_pairs") === 2L) // (1,3) and (2,3); (1,2) has dx=0
    // slopes: (2-1)/(2-1)=1, (2-3)/(2-1)=-1 → median 0
    assert(r.getAs[Double]("slope") === 0.0)
  }

  // ---- Lorenz ---------------------------------------------------------

  test("Stats.lorenz: uniform values give the diagonal; concentration bends the curve") {
    val eq = (1 to 100).map(i => (10.0, i)).toDF("v", "id")
    val r = Stats.lorenz(eq, "v", "id", buckets = 10).orderBy("bucket").collect()
    assert(r.length === 10)
    r.zipWithIndex.foreach { case (row, i) =>
      assert(row.getAs[Double]("cum_pop_share") === (i + 1) / 10.0)
      assert(row.getAs[Double]("cum_value_share") === (i + 1) / 10.0)
    }

    // one holder owns ~all value: first 9 deciles' cumulative share ~ 0
    val conc = ((1 to 99).map(i => (0.01, i)) :+ ((10000.0, 100))).toDF("v", "id")
    val rc = Stats.lorenz(conc, "v", "id", buckets = 10).orderBy("bucket").collect()
    assert(rc(8).getAs[Double]("cum_value_share") < 0.001)
    assert(rc(9).getAs[Double]("cum_value_share") === 1.0)
  }

  test("Stats.lorenz drops non-positive values and keeps integer cents exact") {
    val df = Seq((-5.0, 1), (0.0, 2), (1.23, 3), (2.46, 4)).toDF("v", "id")
    val r = Stats.lorenz(df, "v", "id", buckets = 2).orderBy("bucket").collect()
    assert(r.map(_.getAs[Long]("n")).sum === 2L)
    assert(r.map(_.getAs[Long]("cents")).sum === 123L + 246L)
  }

  // ---- grouped mode ---------------------------------------------------

  test("Stats.modeByGroup: hand counts; smallest-value tie-break; distinct census") {
    val df = Seq(
      ("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "c"),
      ("g2", "z"), ("g2", "y")).toDF("g", "v") // g2: tie between y and z
    val out = Stats.modeByGroup(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("g1").getAs[String]("mode") === "b")
    assert(out("g1").getAs[Long]("n_mode") === 2L)
    assert(out("g1").getAs[Long]("n_distinct") === 3L)
    assert(out("g2").getAs[String]("mode") === "y") // tie → smallest value
    assert(out("g2").getAs[Long]("n_mode") === 1L)
  }

  // ---- table profile --------------------------------------------------

  test("Profile.table: null census, exact distincts, typed ranges") {
    val df = Seq(
      (Some(1L), Some("a"), Some(1.5)),
      (Some(2L), None, Some(-2.5)),
      (None, Some("c"), None),
      (Some(2L), Some("a"), Some(9.0))).toDF("id", "s", "x")
    val out = Profile.table(df, Seq("id", "s", "x")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("id").getAs[Long]("n") === 4L)
    assert(out("id").getAs[Long]("n_null") === 1L)
    assert(out("id").getAs[Long]("n_distinct") === 2L)
    assert(out("id").getAs[Double]("min_num") === 1.0)
    assert(out("id").getAs[Double]("max_num") === 2.0)
    assert(out("id").isNullAt(out("id").fieldIndex("min_str")))
    assert(out("s").getAs[String]("min_str") === "a")
    assert(out("s").getAs[String]("max_str") === "c")
    assert(out("s").isNullAt(out("s").fieldIndex("min_num")))
    assert(out("x").getAs[Double]("min_num") === -2.5)
    assert(out("x").getAs[Double]("max_num") === 9.0)
    assert(out("x").getAs[Long]("n_null") === 1L)
  }

  // ---- IQR fences -----------------------------------------------------

  test("Stats.iqrFences: hand quartiles and planted outliers") {
    // sorted: -100, 1..11, 200 (n=13): q1 = idx 3 = 3, q3 = idx 9 = 9
    val vals = ((1 to 11).map(_.toDouble) ++ Seq(-100.0, 200.0)).map(("g", _))
    val r = Stats.iqrFences(vals.toDF("g", "x"), "g", "x").head()
    assert(r.getAs[Long]("n") === 13L)
    assert(r.getAs[Double]("q1") === 3.0)
    assert(r.getAs[Double]("q3") === 9.0)
    assert(r.getAs[Double]("iqr") === 6.0)
    assert(r.getAs[Double]("fence_lo") === -6.0)
    assert(r.getAs[Double]("fence_hi") === 18.0)
    assert(r.getAs[Long]("n_low") === 1L)  // -100
    assert(r.getAs[Long]("n_high") === 1L) // 200
  }

  test("Stats.iqrFences: interpolating quartiles on even counts; clean data has no outliers") {
    val r = Stats.iqrFences((1 to 4).map(i => ("g", i.toDouble)).toDF("g", "x"), "g", "x").head()
    // p25 at (4-1)*0.25 = 0.75 → 1.75; p75 at 2.25 → 3.25
    assert(r.getAs[Double]("q1") === 1.75)
    assert(r.getAs[Double]("q3") === 3.25)
    assert(r.getAs[Long]("n_low") === 0L && r.getAs[Long]("n_high") === 0L)
  }

  // ---- CMH ------------------------------------------------------------

  test("Stats.cmh: hand two-stratum example") {
    // stratum s1: a=8, r1=10, r2=10, c1=12, c2=8, n=20
    //   E=10*12/20=6, V=10*10*12*8/(400*19)=9600/7600
    // stratum s2: a=2, r1=6, r2=6, c1=6, c2=6, n=12
    //   E=3, V=6*6*6*6/(144*11)=1296/1584
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1, 1)) ++ Seq.fill(b)((s, 1, 0)) ++
        Seq.fill(c)((s, 0, 1)) ++ Seq.fill(d)((s, 0, 0))
    val df = (stratum("s1", 8, 2, 4, 6) ++ stratum("s2", 2, 4, 4, 2)).toDF("s", "e", "o")
    val r = Stats.cmh(df, "s", "e", "o").head()
    val sumA = 10.0; val sumE = 6.0 + 3.0
    val sumV = 9600.0 / 7600.0 + 1296.0 / 1584.0
    val chi = math.pow(math.abs(sumA - sumE) - 0.5, 2) / sumV
    assert(r.getAs[Long]("strata") === 2L)
    assert(r.getAs[Long]("sum_a") === 10L)
    assert(math.abs(r.getAs[Double]("sum_e") - 9.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("cmh_chi2") - math.floor(chi * 1e6 + 0.5) / 1e6) < 1e-6)
  }

  test("Stats.cmh: degenerate strata contribute nothing") {
    // stratum with all-exposed rows (r2=0) must be excluded from both sums
    val good = Seq(("s1", 1, 1), ("s1", 1, 0), ("s1", 0, 1), ("s1", 0, 0))
    val degen = Seq(("s2", 1, 1), ("s2", 1, 0))
    val r = Stats.cmh((good ++ degen).toDF("s", "e", "o"), "s", "e", "o").head()
    assert(r.getAs[Long]("strata") === 2L)
    assert(r.getAs[Long]("sum_a") === 1L) // only s1's a
  }

  test("cochranArmitage: hand-checked three-level trend") {
    // doses 0/1/2, two units each, successes 0/1/2 -> p̄ = .5,
    // T = 5 - .5*6 = 2, Var = .25*(10 - 36/6) = 1, z = 2, chi2 = 4
    val df = Seq(
      (0.0, 0), (0.0, 0), (1.0, 1), (1.0, 0), (2.0, 1), (2.0, 1)
    ).toDF("dose", "succ")
    val r = Stats.cochranArmitage(df, "dose", "succ").head()
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("levels") === 3L)
    assert(r.getAs[Double]("t_stat") === 2.0)
    assert(r.getAs[Double]("var_t") === 1.0)
    assert(r.getAs[Double]("z") === 2.0)
    assert(r.getAs[Double]("chi2") === 4.0)
  }

  test("cochranArmitage: flat rates give zero trend") {
    val df = Seq(
      (0.0, 1), (0.0, 0), (1.0, 1), (1.0, 0), (2.0, 1), (2.0, 0)
    ).toDF("dose", "succ")
    val r = Stats.cochranArmitage(df, "dose", "succ").head()
    assert(r.getAs[Double]("t_stat") === 0.0)
    assert(r.getAs[Double]("z") === 0.0)
  }

  test("ebShrink: hand-checked MoM prior; small groups pull toward the mean") {
    val rows =
      (1 to 10).map(i => ("g1", if (i <= 5) 1 else 0)) ++
        (1 to 10).map(i => ("g2", if (i <= 3) 1 else 0)) ++
        (1 to 10).map(i => ("g3", if (i <= 7) 1 else 0))
    val got = Stats.ebShrink(rows.toDF("g", "en"), "g", "en")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    // p = .5/.3/.7 -> m = .5, v = .04, K = .25/.04 - 1 = 5.25, α = β = 2.625
    assert(got("g1").getAs[Double]("alpha") === 2.625)
    assert(got("g1").getAs[Double]("beta") === 2.625)
    // g2: (3 + 2.625)/(10 + 5.25) = 0.368852...; pulled UP toward .5
    assert(got("g2").getAs[Double]("rate_shrunk") === 0.368852)
    assert(got("g2").getAs[Double]("rate_shrunk") > got("g2").getAs[Double]("rate_raw"))
    // g3 pulled DOWN toward .5
    assert(got("g3").getAs[Double]("rate_shrunk") < got("g3").getAs[Double]("rate_raw"))
    // g1 sits at the prior mean: posterior stays exactly .5
    assert(got("g1").getAs[Double]("rate_shrunk") === 0.5)
  }

  test("ebShrink: degenerate and over-dispersed spreads release null, not garbage") {
    // identical rates -> v = 0 -> prior undefined
    val flat = Seq(("a", 1), ("a", 0), ("b", 1), ("b", 0)).toDF("g", "y")
    val f = Stats.ebShrink(flat, "g", "y").collect()
    assert(f.forall(_.isNullAt(f.head.fieldIndex("rate_shrunk"))))
    // rates 0 and 1 -> v = .5 >= m(1-m) = .25 -> K <= 0 -> null
    val over = Seq(("a", 1), ("a", 1), ("b", 0), ("b", 0)).toDF("g", "y")
    val o = Stats.ebShrink(over, "g", "y").collect()
    assert(o.forall(_.isNullAt(o.head.fieldIndex("rate_shrunk"))))
  }

  test("runsTest: hand z; streaky vs alternating sign; single-sign key null") {
    // key a: 1,1,0,0 -> runs 2, n1=n0=2, E=3, Var=2/3, z = -1/sqrt(2/3)
    val a = Seq(("a", 1, 1), ("a", 2, 1), ("a", 3, 0), ("a", 4, 0))
    // key alt: 1,0,1,0 -> runs 4, z = +1/sqrt(2/3)
    val alt = Seq(("alt", 1, 1), ("alt", 2, 0), ("alt", 3, 1), ("alt", 4, 0))
    // key one: all ones -> variance degenerate
    val one = Seq(("one", 1, 1), ("one", 2, 1))
    val got = Stats.runsTest((a ++ alt ++ one).toDF("k", "t", "b"), "k", "t", "t", "b")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val ra = got("a")
    assert(ra.getAs[Long]("runs") === 2L)
    assert(ra.getAs[Double]("e_runs") === 3.0)
    assert(ra.getAs[Double]("z") === -1.224745)
    assert(got("alt").getAs[Long]("runs") === 4L)
    assert(got("alt").getAs[Double]("z") === 1.224745)
    assert(got("one").isNullAt(got("one").fieldIndex("z")))
    assert(got("one").getAs[Long]("runs") === 1L)
  }

  test("indirectStandardization: mix-adjusted SIR; identical-rate groups land at 1") {
    // stratum s1 rate 0.5, s2 rate 0.2 overall; group A is all-s1 but
    // at the reference rates -> SIR exactly 1 despite a hot raw rate
    val rows =
      (1 to 40).map(i => ("A", "s1", if (i <= 20) 1 else 0)) ++
        (1 to 40).map(i => ("B", "s1", if (i <= 20) 1 else 0)) ++
        (1 to 40).map(i => ("B", "s2", if (i <= 8) 1 else 0))
    val got = Stats.indirectStandardization(rows.toDF("g", "s", "e"), "g", "s", "e")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("A").getAs[Double]("sir") === 1.0)
    assert(got("B").getAs[Double]("sir") === 1.0)
    // now heat group A's s1 events: SIR > 1, B < 1 in compensation
    val hot =
      (1 to 40).map(i => ("A", "s1", if (i <= 30) 1 else 0)) ++
        (1 to 40).map(i => ("B", "s1", if (i <= 10) 1 else 0))
    val h = Stats.indirectStandardization(hot.toDF("g", "s", "e"), "g", "s", "e")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(h("A").getAs[Double]("sir") > 1.0 && h("B").getAs[Double]("sir") < 1.0)
    assert(h("A").getAs[Long]("observed") === 30L)
  }

  test("winsorize: interior values untouched, tails clamp to the exact percentile; groups isolated") {
    val g1 = (1 to 100).map(i => (i.toLong, "a", i.toDouble))
    val g2 = (1 to 10).map(i => (100L + i, "b", 1000.0 * i))
    val got = Stats.winsorize((g1 ++ g2).toDF("id", "g", "v"), "v", Seq("g"),
      pLo = 0.05, pHi = 0.95)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v_w")).toMap
    // group a: percentiles of 1..100 at .05/.95 = 5.95 and 95.05 (interpolated)
    assert(got(1L) === 5.95 && got(100L) === 95.05)
    assert(got(50L) === 50.0) // interior untouched
    // group b independent: its own scale
    assert(got(105L) === 5000.0)
    assert(got(101L) > 1000.0 && got(110L) < 10000.0)
  }

  test("ebShrinkRate: hand Gamma prior; shrink pulls toward the mean rate") {
    // rates 1, 2, 3 with exposure 10 each: m = 2, v = 1 -> α = 4, β = 2
    val rows = Seq(("g1", 10, 10), ("g2", 20, 10), ("g3", 30, 10))
    val got = Stats.ebShrinkRate(rows.toDF("g", "y", "e"), "g", "y", "e")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(got("g1").getAs[Double]("alpha") === 4.0)
    assert(got("g1").getAs[Double]("beta") === 2.0)
    // g1: (10+4)/(10+2) = 7/6 = 1.166667 (pulled UP toward 2)
    assert(got("g1").getAs[Double]("rate_shrunk") === 1.166667)
    assert(got("g3").getAs[Double]("rate_shrunk") < 3.0)
    // prior-mean fixed point: g2 stays exactly 2
    assert(got("g2").getAs[Double]("rate_shrunk") === 2.0)
    // degenerate: equal rates -> v = 0 -> null
    val flat = Seq(("a", 5, 10), ("b", 10, 20)).toDF("g", "y", "e")
    val f = Stats.ebShrinkRate(flat, "g", "y", "e").collect()
    assert(f.forall(_.isNullAt(f.head.fieldIndex("rate_shrunk"))))
  }
}
