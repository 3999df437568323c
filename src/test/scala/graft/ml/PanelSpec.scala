package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PanelSpec extends SparkSpec {
  import spark.implicits._

  test("Panel.between equals closed-form OLS on group means") {
    val df = Seq(
      // g, x, y — group means: g1 (2, 12), g2 (4, 19), g3 (6, 30)
      ("g1", 1.0, 10.0), ("g1", 3.0, 14.0),
      ("g2", 4.0, 19.0),
      ("g3", 5.0, 28.0), ("g3", 7.0, 32.0)
    ).toDF("g", "x", "y")
    val m = Panel.between(df, "y", Seq("x"), "g")
    // hand OLS over the 3 mean points
    val xs = Seq(2.0, 4.0, 6.0); val ys = Seq(12.0, 19.0, 30.0)
    val n = 3.0; val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(m.n === 3L)
    assert(math.abs(m.coef(1) - slope) < 1e-12)
    assert(math.abs(m.coef(0) - icept) < 1e-12)
  }

  test("Panel.firstDifference recovers an exact slope through group effects") {
    // y = 3x + a_g: differencing kills a_g exactly, slope is exactly 3
    val rows = for {
      (g, a) <- Seq(("g1", 100.0), ("g2", -50.0), ("g3", 7.0))
      t <- 1 to 6
    } yield {
      val x = t * 1.0 + (g.hashCode % 5)
      (g, t, x, 3.0 * x + a)
    }
    val df = rows.toDF("g", "t", "x", "y")
    val m = Panel.firstDifference(df, "y", Seq("x"), "g", Seq("t"))
    assert(m.n === 15L) // 18 rows - 3 group heads
    assert(math.abs(m.coef(0) - 3.0) < 1e-12)
  }

  test("Panel.mundlak x-coefficient equals the within estimator (Mundlak 1978)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val mu = Panel.mundlak(li, "l_extendedprice", Seq("l_quantity"), "l_suppkey")
    val fe = FixedEffects.fit(li, "l_extendedprice", Seq("l_quantity"), Seq("l_suppkey"))
    assert(math.abs(mu.coef(1) - fe.coef(0)) < 1e-8 * math.abs(fe.coef(0)))
  }

  test("Panel.didTwoByTwo equals the OLS interaction coefficient and hand cell math") {
    val rng = new scala.util.Random(7)
    val rows = for (i <- 0 until 400) yield {
      val t = i % 2; val p = (i / 2) % 2
      // truth: effect of (t=1 AND p=1) interaction = 5
      val y = 1.0 + 2.0 * t + 3.0 * p + 5.0 * t * p + rng.nextGaussian()
      (i.toLong, t, p, y)
    }
    val df = rows.toDF("id", "t", "p", "y")
    val did = Panel.didTwoByTwo(df, "y", col("t") === 1, col("p") === 1)
    // cross-pin 1: the saturated OLS interaction coefficient is identical
    val ols = Ols.fit(df.withColumn("tp", col("t") * col("p")), "y", Seq("t", "p", "tp"))
    assert(math.abs(did.estimate - ols.coef(3)) < 1e-9)
    // cross-pin 2: hand cell means
    val cells = df.groupBy("t", "p").agg(avg("y").as("m")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val hand = (cells((1, 1)) - cells((1, 0))) - (cells((0, 1)) - cells((0, 0)))
    assert(math.abs(did.estimate - hand) < 1e-12)
    assert(did.n === 400L)
    assert(did.estimate > 4.0 && did.estimate < 6.0)
    assert(did.se > 0.0 && did.se < 1.0)
  }

  test("Ols.fitRidge: λ=0 ≡ OLS, shrinkage is monotone, penalized normal equations hold") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val base = Ols.fit(li, "l_extendedprice", Seq("l_quantity", "l_discount"))
    val r0 = Ols.ridgeFromModel(base, 0.0)
    assert(base.coef.zip(r0.coef).forall { case (a, b) => a == b })

    val r1 = Ols.ridgeFromModel(base, 1e5)
    val r2 = Ols.ridgeFromModel(base, 1e8)
    assert(math.abs(r1.coef(1)) > math.abs(r2.coef(1)))
    // penalized normal equations: (X'X + λD) b = X'y, from the UNPENALIZED gram
    val lam = 1e5
    val k = base.coef.length
    val lhs = (0 until k).map { i =>
      (0 until k).map(j => base.gram(i)(j) * r1.coef(j)).sum +
        (if (i == 0) 0.0 else lam * r1.coef(i))
    }
    lhs.zip(base.xty).foreach { case (l, r) =>
      assert(math.abs(l - r) < 1e-6 * math.max(1.0, math.abs(r)))
    }
  }

  test("Eval.auc: separable=1, anti-separable=0, all-ties=0.5") {
    val sep = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("s", "l")
    assert(math.abs(Eval.auc(sep, "s", "l") - 1.0) < 1e-12)
    val anti = Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0)).toDF("s", "l")
    assert(math.abs(Eval.auc(anti, "s", "l")) < 1e-12)
    val ties = Seq((5.0, 0), (5.0, 1), (5.0, 0), (5.0, 1)).toDF("s", "l")
    assert(math.abs(Eval.auc(ties, "s", "l") - 0.5) < 1e-12)
  }

  test("Eval.auc equals brute-force pair counting, bucket-count invariant") {
    val rng = new scala.util.Random(11)
    val data = (0 until 500).map { i =>
      val l = i % 3 == 0
      // positives shifted up, heavy ties via rounding to 1dp
      val s = math.rint((rng.nextGaussian() + (if (l) 0.8 else 0.0)) * 10) / 10.0
      (s, if (l) 1 else 0)
    }
    val df = data.toDF("s", "l")
    val pos = data.filter(_._2 == 1).map(_._1)
    val neg = data.filter(_._2 == 0).map(_._1)
    val brute = pos.flatMap(p => neg.map(n0 =>
      if (p > n0) 1.0 else if (p == n0) 0.5 else 0.0)).sum / (pos.size.toDouble * neg.size)
    val a256 = Eval.auc(df, "s", "l")
    val a3 = Eval.auc(df, "s", "l", buckets = 3)
    assert(math.abs(a256 - brute) < 1e-12)
    assert(math.abs(a3 - brute) < 1e-12)
  }

  test("Eval.calibration: perfectly calibrated data has ECE 0 and Brier = Σw·p(1−p)") {
    // three bins, each with constant p and an exactly-p fraction of
    // positives: gap per bin is 0, ECE 0, and Brier = mean of p(1−p)
    val rows =
      Seq.fill(3)((0.25, 0)) ++ Seq((0.25, 1)) ++ // p=.25, 1/4 pos
        Seq((0.5, 0), (0.5, 1)) ++ // p=.5, 1/2 pos
        Seq((0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)) // p=.75, 3/4 pos
    val out = Eval.calibration(rows.toDF("p", "l"), "p", "l", bins = 4).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Double]("gap") === 0.0)
      assert(r.getAs[Double]("ece") === 0.0)
    }
    val brier = (4 * 0.25 * 0.75 + 2 * 0.5 * 0.5 + 4 * 0.75 * 0.25) / 10.0
    assert(math.abs(out.head.getAs[Double]("brier") - brier) < 1e-9)
    assert(math.abs(out.head.getAs[Double]("conf") - out.head.getAs[Double]("acc")) < 1e-9)
  }

  test("Eval.calibration: overconfident scores show the gap; p=1.0 lands in the top bin") {
    // all rows claim 0.9 but only half are positive
    val df = (Seq.fill(5)((0.9, 1)) ++ Seq.fill(5)((0.9, 0)) ++ Seq((1.0, 1))).toDF("p", "l")
    val out = Eval.calibration(df, "p", "l", bins = 10).collect()
    assert(out.map(_.getAs[Int]("bin")).toSeq === Seq(9)) // 1.0 clips into bin 9
    val r = out.head
    assert(r.getAs[Long]("n") === 11L)
    assert(math.abs(r.getAs[Double]("conf") - (10 * 0.9 + 1.0) / 11) < 1e-6)
    assert(math.abs(r.getAs[Double]("acc") - 6.0 / 11) < 1e-6)
    assert(r.getAs[Double]("gap") > 0.3)
    assert(r.getAs[Double]("ece") === r.getAs[Double]("gap")) // single bin
    val brier = (Seq.fill(5)(math.pow(0.9 - 1, 2)) ++ Seq.fill(5)(math.pow(0.9, 2)) ++
      Seq(0.0)).sum / 11
    assert(math.abs(r.getAs[Double]("brier") - brier) < 1e-6)
  }


  test("Eval.mannWhitney: hand-computed U, mu, tie-corrected sigma on a tiny sample") {
    // A = {1, 3, 3}, B = {2, 3} — ranks with average ties:
    // values 1,2,3,3,3: rank(1)=1, rank(2)=2, rank(3)=4 (avg of 3,4,5)
    // U_A = sum over A of (#B below + #B tied/2) = 0 + (1+0.5) + (1+0.5) = 3
    val df = Seq((1.0, 1), (3.0, 1), (3.0, 1), (2.0, 0), (3.0, 0)).toDF("v", "f")
    val r = Eval.mannWhitney(df, "v", "f").head()
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n0") === 2L)
    assert(r.getAs[Double]("u") === 3.0)
    assert(r.getAs[Double]("mu") === 3.0)
    // ties: one group of t=3 -> correction (27-3)=24; N=5
    val sigma = math.sqrt(3.0 * 2.0 / 12.0 * ((5 + 1.0) - 24.0 / (5.0 * 4.0)))
    assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-6)
    assert(math.abs(r.getAs[Double]("z")) < 1e-6) // u == mu exactly
  }

  test("Eval.mannWhitney: separable samples hit the extreme U and a large |z|") {
    val df = ((1 to 20).map(i => (i.toDouble, 0)) ++
      (21 to 40).map(i => (i.toDouble, 1))).toDF("v", "f")
    val r = Eval.mannWhitney(df, "v", "f").head()
    assert(r.getAs[Double]("u") === 400.0) // every flagged beats every control
    assert(r.getAs[Double]("z") > 5.0)
    // no ties: sigma equals the classic closed form
    val sigma = math.sqrt(20.0 * 20.0 * 41.0 / 12.0)
    assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-6)
  }

  test("Diagnostics.bhFdr: the step-up rescue — a middle failure is significant when a later rank passes") {
    val df = Seq(("a", 0.02), ("b", 0.068), ("c", 0.09)).toDF("k", "p")
    val out = Diagnostics.bhFdr(df, "p", alpha = 0.10, tieBreak = Seq("k"))
      .select("k", "rank", "significant").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    // crit = [0.0333, 0.0667, 0.1]: rank 2 fails alone but rank 3
    // passes, so ALL of ranks 1..3 are significant (step-up)
    assert(out("a") === ((1, 1)))
    assert(out("b") === ((2, 1)))
    assert(out("c") === ((3, 1)))
  }

  test("Diagnostics.bhFdr: k*=0 when nothing passes; deterministic tie-break; flags monotone in rank") {
    val none = Diagnostics.bhFdr(
      Seq(("a", 0.5), ("b", 0.9)).toDF("k", "p"), "p", alpha = 0.05, tieBreak = Seq("k"))
    assert(none.agg(sum("significant")).head().getLong(0) === 0L)
    val tied = Diagnostics.bhFdr(
      Seq(("b", 0.01), ("a", 0.01), ("c", 0.9)).toDF("k", "p"), "p", 0.05, Seq("k"))
      .select("k", "rank").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(tied("a") === 1 && tied("b") === 2) // ties ranked by key
    val mixed = Diagnostics.bhFdr(
      Seq(("a", 0.001), ("b", 0.002), ("c", 0.9), ("d", 0.95)).toDF("k", "p"), "p", 0.05, Seq("k"))
      .orderBy("rank").select("significant").collect().map(_.getInt(0)).toSeq
    assert(mixed === Seq(1, 1, 0, 0)) // significant set is a rank prefix
  }

  test("Panel.eventStudy: staggered adoption, exact dynamic effects, flat pre-trends") {
    // 40 units × 10 periods; adoption at 4/6/8 or never; zero noise so
    // τ(rel) = [1.0, 1.5, 2.0+] is recovered exactly through both FEs
    val rows = for (u <- 0 until 40; t <- 0 until 10) yield {
      val e: java.lang.Long = (u % 4) match {
        case 0 => 4L
        case 1 => 6L
        case 2 => 8L
        case _ => null
      }
      val rel = if (e == null) Long.MinValue else t - e.longValue
      val tau =
        if (rel == Long.MinValue || rel < 0) 0.0
        else if (rel == 0) 1.0
        else if (rel == 1) 1.5
        else 2.0
      val y = (u % 7) * 3.0 + t * 0.5 + tau
      (u.toLong, t.toLong, e, y)
    }
    val df = rows.toDF("unit", "t", "etime", "y")
    val es = graft.ml.Panel.eventStudy(df, "y", "unit", "t", "etime", leads = 3, lags = 3)
    val byRel = es.relOrder.zip(es.model.coef).toMap
    // pre-periods flat at 0 (the parallel-trends diagnostic)
    Seq(-3, -2).foreach(r => assert(math.abs(byRel(r)) < 1e-6, s"pre rel=$r -> ${byRel(r)}"))
    assert(math.abs(byRel(0) - 1.0) < 1e-6, byRel.toString)
    assert(math.abs(byRel(1) - 1.5) < 1e-6)
    Seq(2, 3).foreach(r => assert(math.abs(byRel(r) - 2.0) < 1e-6))
  }

  test("interruptedTs: planted slope+level break recovered exactly; empty segment nulls") {
    import spark.implicits._
    // pre (t<50): y = 10 + .5 t ; post: y = 40 - .2 t
    // at bp=50: level_pre = 35, level_post = 30 -> level_change = -5
    val rows = (0 until 100).map { t =>
      val y = if (t < 50) 10.0 + 0.5 * t else 40.0 - 0.2 * t
      (t.toDouble, y)
    }
    val r = Panel.interruptedTs(rows.toDF("t", "y"), "t", "y", breakpoint = 50.0).head()
    assert(r.getAs[Long]("n_pre") === 50L && r.getAs[Long]("n_post") === 50L)
    assert(math.abs(r.getAs[Double]("slope_pre") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_post") + 0.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_change") + 0.7) < 1e-9)
    assert(math.abs(r.getAs[Double]("level_pre") - 35.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("level_post") - 30.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("level_change") + 5.0) < 1e-9)
    // breakpoint beyond the data: post segment empty, still ONE row, nulls
    val e = Panel.interruptedTs(rows.toDF("t", "y"), "t", "y", breakpoint = 1000.0).head()
    assert(e.getAs[Long]("n_post") === 0L)
    assert(e.isNullAt(e.fieldIndex("slope_post")) && e.isNullAt(e.fieldIndex("level_change")))
    assert(!e.isNullAt(e.fieldIndex("slope_pre")))
  }

  test("Panel.csDid: hand staggered panel — exact group-time ATTs, pre-period placebo, weighted overall") {
    // periods 1..4. Control units c1/c2: y = 10 + t (parallel trend).
    // Cohort g=3 (two units): y = 20 + t, +5 from t=3 on (true ATT 5).
    // Cohort g=4 (one unit): y = 30 + t, +2 at t=4 (true ATT 2).
    def rows(u: String, base: Double, g: Long, lift: Map[Long, Double]) =
      (1L to 4L).map(t => (u, t, base + t + lift.getOrElse(t, 0.0), g))
    val df = (
      rows("c1", 10, 0, Map()) ++ rows("c2", 10, 0, Map()) ++
        rows("t1", 20, 3, Map(3L -> 5.0, 4L -> 5.0)) ++
        rows("t2", 20, 3, Map(3L -> 5.0, 4L -> 5.0)) ++
        rows("t3", 30, 4, Map(4L -> 2.0))
    ).toDF("u", "t", "y", "g")
    val out = Panel.csDid(df, "u", "t", "y", "g").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // cohort 3, base t=2: ATT(3,3) = ATT(3,4) = 5; placebo ATT(3,1) = 0
    assert(out((3L, 3L)).getAs[Double]("att") === 5.0)
    assert(out((3L, 4L)).getAs[Double]("att") === 5.0)
    assert(out((3L, 1L)).getAs[Double]("att") === 0.0)
    assert(out((3L, 1L)).getAs[Long]("event_time") === -2L)
    // cohort 4, base t=3: ATT(4,4) = 2; placebos 0
    assert(out((4L, 4L)).getAs[Double]("att") === 2.0)
    assert(out((4L, 1L)).getAs[Double]("att") === 0.0)
    // overall = (2·5 + 2·5 + 1·2)/5 — n_treated-weighted over post rows
    assert(math.abs(out((3L, 3L)).getAs[Double]("att_overall") - 22.0 / 5.0) < 1e-9)
    assert(out((3L, 3L)).getAs[Long]("n_treated") === 2L)
    // cohort adopting at the first period has no g-1 base: dropped
    val early = (rows("e1", 5, 1, Map()) ++ rows("c9", 1, 0, Map())).toDF("u", "t", "y", "g")
    assert(Panel.csDid(early, "u", "t", "y", "g").where(col("g") === 1).count() === 0L)
  }
}
