package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("Stats.chiSquare: exact independence gives 0; hand 2×2 value; dof") {
    // perfectly independent: p(a)·p(b) factorizes exactly
    val indep = (for { a <- Seq("x", "y"); b <- Seq("u", "v", "w"); _ <- 1 to (if (a == "x") 2 else 4) }
      yield (a, b)).toDF("a", "b")
    val r0 = Stats.chiSquare(indep, "a", "b").head()
    assert(r0.getDouble(0) === 0.0)
    assert(r0.getLong(1) === 2L) // (2-1)(3-1)

    // hand-computed 2×2: cells 10/20/30/5
    val cells = Seq(("a", "c", 10), ("a", "d", 20), ("b", "c", 30), ("b", "d", 5))
    val df = cells.flatMap { case (x, y, n) => Seq.fill(n)((x, y)) }.toDF("a", "b")
    val n = 65.0
    val e = Map(
      ("a", "c") -> 30.0 * 40 / n, ("a", "d") -> 30.0 * 25 / n,
      ("b", "c") -> 35.0 * 40 / n, ("b", "d") -> 35.0 * 25 / n)
    val hand = cells.map { case (x, y, o) => val ee = e((x, y)); (o - ee) * (o - ee) / ee }.sum
    val r = Stats.chiSquare(df, "a", "b").head()
    assert(math.abs(r.getDouble(0) - math.rint(hand * 1e4) / 1e4) < 1e-9)
    assert(r.getLong(1) === 1L)
    assert(r.getLong(2) === 65L)
  }

  test("Stats.chiSquare counts zero cells through the missing-mass term") {
    // (a,d) never occurs: chi2 must include its expected count
    val df = (Seq.fill(10)(("a", "c")) ++ Seq.fill(10)(("b", "c")) ++ Seq.fill(10)(("b", "d")))
      .toDF("a", "b")
    val chi2 = Stats.chiSquare(df, "a", "b").head().getDouble(0)
    // hand: margins a=10,b=20 / c=20,d=10; e(a,c)=6.67 e(a,d)=3.33 e(b,c)=13.3 e(b,d)=6.67
    val e = Map(("a", "c") -> 200.0 / 30, ("a", "d") -> 100.0 / 30,
      ("b", "c") -> 400.0 / 30, ("b", "d") -> 200.0 / 30)
    val hand = math.pow(10 - e(("a", "c")), 2) / e(("a", "c")) +
      math.pow(0 - e(("a", "d")), 2) / e(("a", "d")) +
      math.pow(10 - e(("b", "c")), 2) / e(("b", "c")) +
      math.pow(10 - e(("b", "d")), 2) / e(("b", "d"))
    assert(math.abs(chi2 - math.rint(hand * 1e4) / 1e4) < 1e-9)
  }

  test("Stats.welchT matches the hand formula on two groups") {
    val g1 = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val g2 = Seq(10.0, 12.0, 14.0, 16.0)
    val df = (g1.map(("a", _)) ++ g2.map(("b", _))).toDF("g", "v")
    val out = Stats.welchT(df, "v", "g").collect().map(r => r.getString(0) -> r).toMap
    def mv(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1))
    }
    val (m1, v1) = mv(g1); val (m2, v2) = mv(g2)
    val se2 = v1 / g1.size + v2 / g2.size
    val t = (m1 - m2) / math.sqrt(se2)
    val dfw = se2 * se2 / (math.pow(v1 / g1.size, 2) / (g1.size - 1) + math.pow(v2 / g2.size, 2) / (g2.size - 1))
    val ra = out("a")
    assert(math.abs(ra.getDouble(4) - math.rint(t * 1e4) / 1e4) < 1e-9)
    assert(math.abs(ra.getDouble(5) - math.rint(dfw * 100) / 100) < 1e-9)
    // the "b vs rest" row is the sign-flipped contrast
    assert(math.abs(out("b").getDouble(4) + ra.getDouble(4)) < 1e-3)
  }

  test("Stats.concentration: degenerate and uniform landmarks") {
    val one = Seq.fill(10)(("p1", "only")).toDF("p", "c")
    val r1 = Stats.concentration(one, "p", "c").head()
    assert(r1.getDouble(3) === 1.0) // hhi
    assert(r1.getDouble(4) === 0.0) // entropy
    assert(r1.getDouble(5) === 0.0) // gini of a single share

    val unif = (for (c <- 'a' to 'e'; _ <- 1 to 7) yield ("p1", c.toString)).toDF("p", "c")
    val ru = Stats.concentration(unif, "p", "c").head()
    assert(math.abs(ru.getDouble(3) - 0.2) < 1e-9)
    assert(math.abs(ru.getDouble(4) - math.rint(math.log(5.0) * 1e4) / 1e4) < 1e-9)
    assert(ru.getDouble(5) === 0.0) // equal shares → zero Gini
  }

  test("Stats.winsorizedMean clips exactly at the interpolated percentiles") {
    val vals = (1 to 100).map(_.toDouble)
    val df = vals.map(("g", _)).toDF("g", "v")
    val r = Stats.winsorizedMean(df, "v", "g", 0.05, 0.95).head()
    // percentile over 1..100: p05 at index 4.95 → 5.95; p95 at index 94.05 → 95.05
    assert(math.abs(r.getDouble(2) - 5.95) < 1e-9)
    assert(math.abs(r.getDouble(3) - 95.05) < 1e-9)
    val clipped = vals.map(v => math.min(math.max(v, 5.95), 95.05))
    assert(math.abs(r.getDouble(4) - math.rint(clipped.sum / 100 * 1e4) / 1e4) < 1e-9)
    assert(r.getDouble(5) === 50.5)
  }

  test("Bootstrap weights: deterministic, Poisson(1)-shaped, SE near the analytic one") {
    val df = spark.range(20000).toDF("id")
      .withColumn("g", lit("all"))
      .withColumn("y", (col("id") % 100).cast("double"))
    // determinism: the same call twice is bit-identical
    val a = Bootstrap.groupedMeanSE(df, "y", "g", col("id").cast("string"), b = 16).head()
    val b = Bootstrap.groupedMeanSE(df, "y", "g", col("id").cast("string"), b = 16).head()
    assert(a === b)
    // weight distribution: mean ≈ 1 over many draws
    // truncation at 4 biases E[w] down by ~0.004; 3σ sampling band ~0.021
    val wbar = df.select(avg(Bootstrap.weight(col("id").cast("string"), 0))).head().getDouble(0)
    assert(math.abs(wbar - 1.0) < 0.03)
    // bootstrap SE vs analytic s/sqrt(n): y uniform on 0..99 → s ≈ 28.87
    val analytic = 28.866 / math.sqrt(20000.0)
    val se = a.getDouble(3)
    assert(se > analytic / 2 && se < analytic * 2, s"boot SE $se vs analytic $analytic")
  }

  test("Bootstrap.olsSlopeSE: point slope ≡ Ols.fit; cluster SE tracks the clustered analytic") {
    val rng = new scala.util.Random(19)
    // strong within-cluster correlation: cluster effect dominates noise
    val rows = for (c <- 0 until 50; _ <- 0 until 40) yield {
      val eff = (c % 7 - 3.0) * 2.0
      val x = rng.nextDouble() * 10
      (c, x, 2.0 * x + eff + rng.nextGaussian() * 0.5)
    }
    val df = rows.toDF("cl", "x", "y")
    val out = graft.ops.Bootstrap.olsSlopeSE(df, "y", "x", "cl", b = 32).head()
    val fit = graft.ml.Ols.fit(df, "y", Seq("x"))
    assert(math.abs(out.getDouble(1) - math.rint(fit.coef(1) * 1e4) / 1e4) < 1e-9)
    val vc = graft.ml.Ols.varianceClustered(df, fit, "y", "cl")
    val seAnalytic = math.sqrt(vc(1)(1))
    val seBoot = out.getDouble(2)
    assert(seBoot > seAnalytic / 3 && seBoot < seAnalytic * 3,
      s"boot $seBoot vs clustered analytic $seAnalytic")
    // determinism
    val again = graft.ops.Bootstrap.olsSlopeSE(df, "y", "x", "cl", b = 32).head()
    assert(out === again)
  }

  test("Diversity.distinctN: repeated text scores below diverse text; exact tiny counts") {
    val docs = Seq(
      ("rep", "a a a a"),      // 4 unigrams 1 distinct; 3 bigrams 1 distinct
      ("div", "a b c d")       // 4 unigrams 4 distinct; 3 bigrams 3 distinct
    ).toDF("src", "text")
    val out = graft.text.Diversity.distinctN(docs, "text", "src")
      .collect().map(r => r.getString(0) -> r).toMap
    val rep = out("rep"); val div = out("div")
    assert(rep.getLong(3) === 4L && rep.getLong(4) === 1L)
    assert(rep.getDouble(5) === 0.25)
    assert(rep.getLong(6) === 3L && rep.getLong(7) === 1L)
    assert(div.getDouble(5) === 1.0)
    assert(div.getLong(6) === 3L && div.getLong(7) === 3L)
    assert(div.getDouble(8) === 1.0)
    // short-doc fallback: a 1-token doc contributes its text as the single 2-gram
    val short = Seq(("s", "solo")).toDF("src", "text")
    val rs = graft.text.Diversity.distinctN(short, "text", "src").head()
    assert(rs.getLong(6) === 1L && rs.getLong(7) === 1L)
  }

  test("Stats.rfm: hand-computed recency/frequency/monetary and quintile scores") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    def ts(daysAgo: Int) = new java.sql.Timestamp(base.getTime - daysAgo * 86400000L)
    // 10 users: user i has i+1 events, most recent i days ago, value 10*(i+1)
    val rows = for {
      i <- 0 until 10
      j <- 0 to i
    } yield (i.toLong, ts(i + j), 10.0)
    val out = graft.ops.Stats.rfm(rows.toDF("user_id", "ts", "value"), "user_id", "ts", "value")
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[Int]("r_score"), r.getAs[Int]("f_score"))))
      .toMap
    // user 0: 1 event 0 days ago; user 9: 10 events, latest 9 days ago
    assert(out(0L)._1 === 0L && out(0L)._2 === 1L && out(0L)._3 === 10.0)
    assert(out(9L)._1 === 9L && out(9L)._2 === 10L && out(9L)._3 === 100.0)
    // r_score: most recent = highest quintile; f_score: most frequent = 5
    assert(out(0L)._4 === 5 && out(9L)._4 === 1)
    assert(out(0L)._5 === 1 && out(9L)._5 === 5)
    // 10 users over 5 quintiles: every score appears exactly twice
    val rCounts = out.values.groupBy(_._4).view.mapValues(_.size).toMap
    assert(rCounts === Map(1 -> 2, 2 -> 2, 3 -> 2, 4 -> 2, 5 -> 2))
  }

  test("Stats.spearman: monotone gives 1, reversed gives -1, ties use mid-ranks") {
    val mono = (1 to 8).map(i => ("g", i.toDouble, i * i.toDouble, i.toLong))
    val rev = (1 to 8).map(i => ("h", i.toDouble, -i.toDouble, i.toLong))
    val df = (mono ++ rev).toDF("g", "x", "y", "tie")
    val out = Stats.spearman(df, "g", "x", "y", "tie").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("g") === 1.0)
    assert(out("h") === -1.0)

    // hand case with ties: x = (1,2,2,3), y = (10,20,30,40)
    // mid-ranks x: 1, 2.5, 2.5, 4; y: 1,2,3,4
    val tied = Seq(("t", 1.0, 10.0, 1L), ("t", 2.0, 20.0, 2L), ("t", 2.0, 30.0, 3L), ("t", 3.0, 40.0, 4L))
    val rx = Seq(1.0, 2.5, 2.5, 4.0); val ry = Seq(1.0, 2.0, 3.0, 4.0)
    val n = 4.0
    val num = n * rx.zip(ry).map { case (a, b) => a * b }.sum - rx.sum * ry.sum
    val den = math.sqrt((n * rx.map(a => a * a).sum - rx.sum * rx.sum) *
      (n * ry.map(a => a * a).sum - ry.sum * ry.sum))
    val hand = math.rint(num / den * 1e6) / 1e6
    val got = Stats.spearman(tied.toDF("g", "x", "y", "tie"), "g", "x", "y", "tie")
      .head().getDouble(2)
    assert(math.abs(got - hand) < 1e-12)
  }

  test("Stats.benford: planted digit counts, exact extraction, hand chi2") {
    // 30 values leading with 1, 10 with 2, 5 with 9; include a sub-1.0
    // value (0.05 → cents 5 → digit 5) to pin the integer extraction
    val vals = Seq.fill(30)(123.45) ++ Seq.fill(10)(29.99) ++ Seq.fill(5)(9000.01) ++ Seq(0.05)
    val df = vals.map(Tuple1(_)).toDF("v")
    val rows = Stats.benford(df, "v").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1)._1 === 30L && rows(2)._1 === 10L && rows(9)._1 === 5L && rows(5)._1 === 1L)
    assert(rows(1)._2 === math.rint(30.0 / 46 * 1e6) / 1e6)
    val tot = 46.0
    val obs = Map(1 -> 30L, 2 -> 10L, 5 -> 1L, 9 -> 5L)
    // observed digits + the missing-mass term for the five absent ones
    val hand = obs.map { case (d, n) =>
      val e = Stats.benfordShare(d) * tot; (n - e) * (n - e) / e
    }.sum + (tot - obs.keys.map(d => Stats.benfordShare(d) * tot).sum)
    val got = Stats.benford(df, "v").collect().head.getDouble(4)
    assert(math.abs(got - math.rint(hand * 1e4) / 1e4) < 1e-6)
  }

  test("Stats.gini: uniform 0, single-owner (n-1)/n, hand mid case; tie-order invariant") {
    val uniform = Seq.fill(8)(("u", 5.0)).toDF("g", "v")
    assert(Stats.gini(uniform, "g", "v").head().getAs[Double]("gini") === 0.0)

    // one unit owns everything: G = (n-1)/n = 0.75 for n=4
    val owner = (Seq.fill(3)(("o", 0.0)) :+ (("o", 100.0))).toDF("g", "v")
    assert(Stats.gini(owner, "g", "v").head().getAs[Double]("gini") === 0.75)

    // hand: x = 1,2,3,4 cents .01..?  use 0.01,0.02,0.03,0.04
    // G = (2*(1+4+9+16) - 5*10) / (4*10) = (60-50)/40 = 0.25
    val hand = Seq(("h", 0.01), ("h", 0.02), ("h", 0.03), ("h", 0.04)).toDF("g", "v")
    assert(Stats.gini(hand, "g", "v").head().getAs[Double]("gini") === 0.25)

    // ties: duplicated values in any insertion order give the same G
    val t1 = Seq(("t", 1.0), ("t", 1.0), ("t", 3.0)).toDF("g", "v")
    val t2 = Seq(("t", 3.0), ("t", 1.0), ("t", 1.0)).toDF("g", "v")
    assert(Stats.gini(t1, "g", "v").head().getAs[Double]("gini") ===
      Stats.gini(t2, "g", "v").head().getAs[Double]("gini"))
  }

  test("Stats.anovaOneWay: hand 3-group F and eta^2; identical groups give F = 0") {
    // groups: (1,2,3), (2,3,4), (7,8,9) — hand: means 2,3,8; grand 13/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 7.0), ("c", 8.0), ("c", 9.0)).toDF("g", "v")
    val r = Stats.anovaOneWay(df, "v", "g").head()
    val grand = 39.0 / 9
    val ssb = 3 * (math.pow(2 - grand, 2) + math.pow(3 - grand, 2) + math.pow(8 - grand, 2))
    val ssw = 6.0 // each group contributes (1+0+1) = 2
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) < 0.011)
    assert(math.abs(r.getAs[Double]("ss_within") - ssw) < 0.011)
    assert(math.abs(r.getAs[Double]("f_stat") - (ssb / 2) / (ssw / 6)) < 1e-4)
    assert(math.abs(r.getAs[Double]("eta_sq") - ssb / (ssb + ssw)) < 1e-4)
    val flat = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    assert(Stats.anovaOneWay(flat, "v", "g").head().getAs[Double]("f_stat") == 0.0)
  }

  test("Stats.leveneTest flags unequal spreads, stays calm on equal ones") {
    val rng = new scala.util.Random(7)
    val tight = (1 to 500).map(_ => ("t", rng.nextGaussian() * 1.0))
    val wide = (1 to 500).map(_ => ("w", rng.nextGaussian() * 5.0))
    val unequal = Stats.leveneTest((tight ++ wide).toDF("g", "v"), "v", "g").head()
    assert(unequal.getAs[Double]("f_stat") > 50.0)
    val tight2 = (1 to 500).map(_ => ("u", rng.nextGaussian() * 1.0))
    val equal = Stats.leveneTest((tight ++ tight2).toDF("g", "v"), "v", "g").head()
    assert(equal.getAs[Double]("f_stat") < 5.0)
  }
}
