package graft.ml

import graft.SparkSpec

class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("storeyQ: hand-computed pi0 and q-values; suffix-min monotonicity; pi0 clamp") {
    // pi0 < 1: one of four p's above lambda=0.5 → pi0 = 1/(0.5·4) = 0.5
    val df = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03), ("d", 0.9)).toDF("k", "p")
    val out = graft.ml.Diagnostics.storeyQ(df, "p", Seq("k"))
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Int]("rank"), r.getAs[Double]("pi0"), r.getAs[Double]("q_value")))).toMap
    assert(out("a")._2 === 0.5)
    // raw_i = min(1, 0.5·4·p_i/i) = [0.02, 0.02, 0.02, 0.45]; suffix mins
    assert(out("a")._3 === 0.02 && out("b")._3 === 0.02 && out("c")._3 === 0.02)
    assert(out("d")._3 === 0.45)
    // q is monotone nondecreasing in rank by construction
    val sorted = out.values.toSeq.sortBy(_._1).map(_._3)
    assert(sorted === sorted.sorted)

    // pi0 clamps at 1 when most p's are large; raw clamps at 1
    val df2 = Seq(("a", 0.01), ("b", 0.02), ("c", 0.8), ("d", 0.9)).toDF("k", "p")
    val out2 = graft.ml.Diagnostics.storeyQ(df2, "p", Seq("k"))
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("q_value")).toMap
    // pi0 = 2/(0.5·4) = 1.0 → raw = [0.04, 0.04, min(1, 1.0667)=1, 0.9]
    assert(out2("a") === 0.04 && out2("b") === 0.04)
    assert(out2("c") === 0.9 && out2("d") === 0.9)
  }

  test("Driscoll-Kraay with L=0 equals the cluster-by-period sandwich exactly") {
    val rows = (0 until 900).map { i =>
      val t = i / 30
      val x = math.sin(i * 0.71) * 2
      (t, x, 1.0 + 2.0 * x + math.sin(t * 1.3) + 0.3 * math.sin(i * 2.1))
    }
    val df = rows.toDF("t", "x", "y")
    val m = Ols.fit(df, "y", Seq("x"))
    val dk0 = Diagnostics.varianceDriscollKraay(df, m, "y", "t", maxLag = 0)
    val cl = Ols.varianceClustered(df, m, "y", "t")
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(dk0(i)(j) - cl(i)(j)) < 1e-9 * math.max(1.0, math.abs(cl(i)(j))),
        s"($i,$j): ${dk0(i)(j)} vs ${cl(i)(j)}")
  }

  test("Driscoll-Kraay with lags matches a dense driver-side computation") {
    val rows = (0 until 600).map { i =>
      val t = i / 20
      val x = math.cos(i * 0.37)
      (t, x, 0.5 + 1.5 * x + math.sin(t * 0.9) + 0.2 * math.cos(i * 1.7))
    }
    val df = rows.toDF("t", "x", "y")
    val m = Ols.fit(df, "y", Seq("x"))
    val L = 2
    val v = Diagnostics.varianceDriscollKraay(df, m, "y", "t", L)

    // dense reference
    val b0 = m.coef(0); val b1 = m.coef(1)
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, rs) =>
      val hs = rs.map { case (_, x, y) => val u = y - b0 - b1 * x; (u, u * x) }
      (hs.map(_._1).sum, hs.map(_._2).sum)
    }
    val k = 2
    val meat = Array.ofDim[Double](k, k)
    def h(t: Int): Array[Double] = Array(byT(t)._1, byT(t)._2)
    for (t <- byT.indices; i <- 0 until k; j <- 0 until k) meat(i)(j) += h(t)(i) * h(t)(j)
    for (l <- 1 to L) {
      val wl = 1.0 - l.toDouble / (L + 1)
      for (t <- l until byT.length; i <- 0 until k; j <- 0 until k) {
        meat(i)(j) += wl * h(t)(i) * h(t - l)(j)
        meat(j)(i) += wl * h(t)(i) * h(t - l)(j)
      }
    }
    val bread = LinAlg.inverse(m.gram)
    val ref = LinAlg.matMul(LinAlg.matMul(bread, meat), bread)
    for (i <- 0 until k; j <- 0 until k)
      assert(math.abs(v(i)(j) - ref(i)(j)) < 1e-8 * math.max(1e-12, math.abs(ref(i)(j))),
        s"($i,$j): ${v(i)(j)} vs ${ref(i)(j)}")
    // serial correlation in the period scores inflates the SE vs L=0
    val v0 = Diagnostics.varianceDriscollKraay(df, m, "y", "t", 0)
    assert(v(1)(1) > v0(1)(1), s"lagged ${v(1)(1)} vs L0 ${v0(1)(1)}")
  }

  test("Breusch-Pagan: large on planted heteroskedasticity, small on homoskedastic noise") {
    def lm(hetero: Boolean): Double = {
      val rows = (0 until 3000).map { i =>
        val x = ((i * 0.6180339887498949) % 1.0) * 4.0
        val eps = math.sin(i * 12.9898 + 0.5) * (if (hetero) 0.2 + x else 1.0)
        (x, 1.0 + 2.0 * x + eps)
      }
      val df = rows.toDF("x", "y")
      val m = Ols.fit(df, "y", Seq("x"))
      Diagnostics.breuschPagan(df, m, "y")._1
    }
    val lmHet = lm(hetero = true)
    val lmHom = lm(hetero = false)
    // chi2(1) 1% critical value is 6.63
    assert(lmHet > 100.0, s"planted heteroskedasticity LM=$lmHet")
    assert(lmHom < 6.63, s"homoskedastic LM=$lmHom")
  }

  test("Breusch-Pagan matches the n*corr^2 closed form on a simple regression") {
    val rows = (0 until 500).map { i =>
      val x = math.sin(i * 0.77) * 2
      (x, 1.0 + x + 0.3 * math.sin(i * 3.1) * (1 + x * x))
    }
    val df = rows.toDF("x", "y")
    val m = Ols.fit(df, "y", Seq("x"))
    val (lmStat, n) = Diagnostics.breuschPagan(df, m, "y")
    // dense: LM = n * corr(x, u^2)^2
    val u2 = rows.map { case (x, y) => (x, math.pow(y - m.coef(0) - m.coef(1) * x, 2)) }
    val nn = u2.size.toDouble
    val sx = u2.map(_._1).sum; val sz = u2.map(_._2).sum
    val sxx = u2.map(p => p._1 * p._1).sum; val szz = u2.map(p => p._2 * p._2).sum
    val sxz = u2.map(p => p._1 * p._2).sum
    val corr2 = math.pow(nn * sxz - sx * sz, 2) / ((nn * sxx - sx * sx) * (nn * szz - sz * sz))
    assert(n === 500L)
    assert(math.abs(lmStat - nn * corr2) < 1e-6 * nn * corr2, s"$lmStat vs ${nn * corr2}")
  }

  test("Durbin-Watson: exact vs driver loop; AR(+) below 2, independent near 2") {
    // seeded PRNG noise: genuinely serially independent (sin(i*c)
    // phase-steps are ~0.91-correlated and would fake an AR signal)
    val noiseArr = { val r = new scala.util.Random(5); Array.fill(2000)(r.nextDouble() - 0.5) }
    def hnoise(i: Int): Double = noiseArr(i)
    // AR(1) residual structure via a recursion baked into y
    var ar = 0.0
    val arRows = (0 until 2000).map { i =>
      ar = 0.85 * ar + hnoise(i) * 0.5
      (i, 1.0, 3.0 + ar) // x constant-free: regress y ~ 1 only (intercept)
    }
    val arDf = arRows.toDF("i", "x", "y")
    val mAr = Ols.fit(arDf, "y", Seq("x"), intercept = false)
    val dwAr = Diagnostics.durbinWatson(arDf, mAr, "y", Seq("i"))
    // driver reference
    val us = arRows.map { case (_, x, y) => y - mAr.coef(0) * x }
    val ref = us.sliding(2).map { case Seq(a, b) => (b - a) * (b - a) }.sum / us.map(u => u * u).sum
    assert(math.abs(dwAr - ref) < 1e-12, s"$dwAr vs $ref")
    assert(dwAr < 1.0, s"positive AR should push DW toward 0, got $dwAr")

    val indRows = (0 until 2000).map(i => (i, 1.0, 3.0 + hnoise(i) * 0.5))
    val indDf = indRows.toDF("i", "x", "y")
    val mInd = Ols.fit(indDf, "y", Seq("x"), intercept = false)
    val dwInd = Diagnostics.durbinWatson(indDf, mInd, "y", Seq("i"))
    assert(math.abs(dwInd - 2.0) < 0.25, s"independent noise DW=$dwInd")
  }

  test("Diagnostics.ljungBox: hand ACF on a ramp; alternating series; degenerate keys dropped") {
    import spark.implicits._
    // ramp 1..6: mean 3.5, den 17.5; rho1 = 8.75/17.5 = 0.5, rho2 = 1/17.5
    val ramp = (1 to 6).map(t => ("ramp", t, t.toDouble, t))
    // alternating ±1, n=8: rho1 = -7/8
    val alt = (1 to 8).map(t => ("alt", t, if (t % 2 == 0) -1.0 else 1.0, t))
    // constant series: zero variance → dropped
    val const = (1 to 6).map(t => ("const", t, 4.0, t))
    // too short (n ≤ maxLag) → dropped
    val short = (1 to 2).map(t => ("short", t, t.toDouble, t))
    val df = (ramp ++ alt ++ const ++ short).toDF("k", "t", "x", "id")
    val out = Diagnostics.ljungBox(df, "k", "t", "x", "id", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getAs[Number]("lag").longValue()) -> r).toMap

    assert(out.keys.map(_._1).toSet === Set("ramp", "alt"))

    val r1 = out(("ramp", 1L))
    assert(r1.getAs[Double]("rho") === 0.5)
    // Q1 = 6*8*0.25/5 = 2.4
    assert(r1.getAs[Double]("lb_q") === 2.4)
    val r2 = out(("ramp", 2L))
    val rho2 = 1.0 / 17.5
    assert(math.abs(r2.getAs[Double]("rho") - math.floor(rho2 * 1e6 + 0.5) / 1e6) < 1e-9)
    val q2 = 48.0 * (0.25 / 5.0 + rho2 * rho2 / 4.0)
    assert(math.abs(r2.getAs[Double]("lb_q") - math.floor(q2 * 1e6 + 0.5) / 1e6) < 1e-6)

    assert(out(("alt", 1L)).getAs[Double]("rho") === -0.875)
  }

  test("grangerOneLag: planted x->y lead is detected; independent x is quiet; degenerate keys null") {
    def noise(i: Int, s: Double) = ((i * s) % 1.0) - 0.5
    // key "lead": y_t = 0.9*x_{t-1} + small noise; x is its own noisy walk
    val lead = (1 until 400).map { i =>
      val xPrev = noise(i - 1, 0.6180339887498949)
      ("lead", i, 0.9 * xPrev + 0.05 * noise(i, 0.7548776662466927),
        noise(i, 0.6180339887498949))
    }
    // key "indep": y and x unrelated
    val indep = (1 until 400).map { i =>
      ("indep", i, noise(i, 0.5545497), noise(i, 0.30801928))
    }
    // key "flat": constant y -> zero variance -> nulls
    val flat = (1 until 10).map(i => ("flat", i, 1.0, noise(i, 0.61)))
    val df = (lead ++ indep ++ flat).toDF("k", "t", "y", "x")
    val got = Diagnostics.grangerOneLag(df, "k", "t", "t", "y", "x")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(got("lead").getAs[Double]("f_stat") > 50.0)
    assert(got("indep").getAs[Double]("f_stat") < 5.0)
    assert(got("flat").isNullAt(got("flat").fieldIndex("f_stat")))
    assert(got("flat").isNullAt(got("flat").fieldIndex("r_y_ylag")))
  }

  test("chow: a planted slope break alarms; identical regimes are quiet") {
    def noise(i: Int) = ((i * 0.7548776662466927) % 1.0) - 0.5
    val broken = (1 to 200).map { i =>
      val x = i / 10.0
      if (i % 2 == 0) (1.0 + 2.0 * x + 0.1 * noise(i), x, 0)
      else (30.0 - 1.0 * x + 0.1 * noise(i), x, 1)
    }
    val b = Diagnostics.chow(broken.toDF("y", "x", "g"), "y", "x", "g").head()
    assert(b.getAs[Double]("f_stat") > 1000.0, s"break must alarm: $b")
    assert(b.getAs[Long]("n_a") === 100L && b.getAs[Long]("n_b") === 100L)

    val same = (1 to 200).map { i =>
      val x = i / 10.0
      (1.0 + 2.0 * x + 0.1 * noise(i), x, i % 2)
    }
    val s = Diagnostics.chow(same.toDF("y", "x", "g"), "y", "x", "g").head()
    assert(s.getAs[Double]("f_stat") < 5.0, s"same line must be quiet: $s")
    // split SSR can never exceed pooled
    assert(s.getAs[Double]("ssr_split") <= s.getAs[Double]("ssr_pooled") + 1e-9)
  }

  test("influenceSimple: leverage sums to 2, a planted outlier owns Cook's D") {
    // clean line y = 2x with one wild point at the x-extreme
    val rows = (1 to 50).map(i => (i.toLong, 2.0 * i + (if (i % 3 == 0) 0.2 else -0.1), i.toDouble)) :+
      (99L, 500.0, 60.0) // far in x AND off the line
    val got = Diagnostics.influenceSimple(rows.toDF("id", "y", "x"), "id", "y", "x")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // Σh = p = 2 for simple regression with intercept
    val hSum = got.values.map(_.getAs[Double]("leverage")).sum
    assert(math.abs(hSum - 2.0) < 1e-5, s"sum of leverages must be 2, got $hSum")
    val dOutlier = got(99L).getAs[Double]("cooks_d")
    val dMax = got.filterKeys(_ != 99L).values.map(_.getAs[Double]("cooks_d")).max
    assert(dOutlier > 100 * dMax, s"outlier must dominate: $dOutlier vs $dMax")
    // degenerate: constant x -> all diagnostics null
    val flat = (1 to 5).map(i => (i.toLong, i.toDouble, 1.0))
    val f = Diagnostics.influenceSimple(flat.toDF("id", "y", "x"), "id", "y", "x").collect()
    assert(f.forall(_.isNullAt(f.head.fieldIndex("leverage"))))
  }

  test("holm: hand step-down; running max enforces monotone adjusted p") {
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.04), (4L, 0.3)).toDF("id", "p")
    val got = Diagnostics.holm(df, "p", alpha = 0.05, tieBreak = Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(math.abs(got(1L).getAs[Double]("p_holm") - 0.04) < 1e-12)
    assert(math.abs(got(2L).getAs[Double]("p_holm") - 0.06) < 1e-12)
    assert(math.abs(got(3L).getAs[Double]("p_holm") - 0.08) < 1e-12)
    assert(math.abs(got(4L).getAs[Double]("p_holm") - 0.3) < 1e-12)
    assert(got(1L).getAs[Int]("significant") === 1)
    assert(Seq(2L, 3L, 4L).forall(got(_).getAs[Int]("significant") === 0))
    assert(math.abs(got(1L).getAs[Double]("p_bonf") - 0.04) < 1e-12)
    // monotonicity: a SMALLER raw later in rank inherits the earlier max
    val mono = Seq((1L, 0.01), (2L, 0.011), (3L, 0.5)).toDF("id", "p")
    val g2 = Diagnostics.holm(mono, "p", 0.05, Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("p_holm")).toMap
    assert(math.abs(g2(1L) - 0.03) < 1e-12) // 3*.01
    assert(math.abs(g2(2L) - 0.03) < 1e-12) // raw .022 < .03 -> inherits
  }

  test("holm: distributed carry matches a driver replica on 2000 hypotheses") {
    val rows = (1L to 2000L).map(i => (i, ((i * 0.6180339887498949) % 1.0)))
    val got = Diagnostics.holm(rows.toDF("id", "p").repartition(13), "p", 0.05, Seq("id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("p_holm")).toMap
    val m = rows.size
    val sorted = rows.sortBy { case (id, p) => (p, id) }
    var run = 0.0
    val ref = sorted.zipWithIndex.map { case ((id, p), i) =>
      run = math.max(run, (m - i).toDouble * p) // rank = i+1 -> m-i terms
      id -> math.min(1.0, run)
    }.toMap
    rows.foreach { case (id, _) =>
      assert(math.abs(got(id) - ref(id)) < 1e-12, s"id=$id")
    }
  }
}
