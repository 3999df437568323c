package graft.ml

import graft.SparkSpec

/** RandomEffects (Swamy–Arora FGLS + Hausman), UnitRoot (Dickey–
  * Fuller), and Causal.rdd (sharp RD) — the r11 econometrics
  * additions, each pinned against planted ground truth or a dense
  * driver replica.
  */
class PanelReSpec extends SparkSpec {
  import spark.implicits._

  // balanced panel generator: y = b*x + u_g + e with deterministic
  // "noise" streams (no RNG — reproducible)
  private def panel(groups: Int, t: Int, b: Double, uScale: Double) =
    (for (g <- 0 until groups; i <- 0 until t) yield {
      val x = math.sin(g * 1.7 + i * 0.9) * 2 + g * 0.05
      val u = uScale * math.cos(g * 2.3)
      val e = 0.3 * math.sin(g * 5.1 + i * 3.7)
      (s"g$g", x, b * x + u + e)
    }).toDF("g", "x", "y")

  test("RandomEffects: exogenous effects — RE ≈ FE ≈ truth, Hausman small") {
    // u_g uncorrelated with x by construction (cos vs sin phases)
    val df = panel(groups = 40, t = 8, b = 2.0, uScale = 1.5)
    val m = RandomEffects.fit(df, "y", "x", "g")
    assert(math.abs(m.bFe - 2.0) < 0.05, s"FE slope ${m.bFe}")
    assert(math.abs(m.bRe - 2.0) < 0.05, s"RE slope ${m.bRe}")
    assert(m.sigmaU > 0.5, s"between component missing: ${m.sigmaU}")
    assert(m.sigmaE > 0.1 && m.sigmaE < 0.5, s"sigma_e ${m.sigmaE}")
    // balanced panel: all thetas equal
    assert(math.abs(m.thetaMin - m.thetaMax) < 1e-12)
    assert(m.n === 320L && m.groups === 40L)
    // exogenous effects: the two slopes agree, Hausman does not reject
    if (!m.hausman.isNaN) assert(m.hausman < 3.84, s"H ${m.hausman}") // χ²(1) 5%
  }

  test("RandomEffects: correlated effects — FE stays consistent, RE biased, Hausman rejects") {
    // u_g = 3·x̄_g: maximal effect-regressor correlation
    val rows = for (g <- 0 until 40; i <- 0 until 8) yield {
      val x = math.sin(g * 1.7 + i * 0.9) + g * 0.1 // group mean rises in g
      val u = 3.0 * (g * 0.1) // correlated with x through the group level
      val e = 0.1 * math.sin(g * 5.1 + i * 3.7)
      (s"g$g", x, 2.0 * x + u + e)
    }
    val df = rows.toDF("g", "x", "y")
    val m = RandomEffects.fit(df, "y", "x", "g")
    assert(math.abs(m.bFe - 2.0) < 0.05, s"FE slope must stay consistent: ${m.bFe}")
    // the RE/GLS slope mixes the contaminated between variation back in
    // (θ < 1), so it drifts up from the truth — by little in absolute
    // terms when σ_u is large (θ → 1 pushes RE toward FE), but the
    // Hausman statistic scales the gap by its (tiny) variance and
    // rejects decisively, which is the actual contract
    assert(m.bRe - 2.0 > 0.02, s"RE must absorb the correlated effect upward: ${m.bRe}")
    assert(!m.hausman.isNaN && m.hausman > 6.63, // χ²(1) 1%
      s"Hausman must reject exogeneity: ${m.hausman}")
    assert(m.pValue < 0.01)
  }

  test("RandomEffects: theta → 0 recovers pooled OLS, dense parity on the closed forms") {
    // no group effect at all: sigma_u ≈ 0 → θ ≈ 0 → RE ≡ pooled OLS
    val df = panel(groups = 30, t = 6, b = 1.5, uScale = 0.0)
    val m = RandomEffects.fit(df, "y", "x", "g")
    assert(m.thetaMax < 0.35, s"theta should be small: ${m.thetaMax}")
    // dense replica of the same closed-form chain
    val rows = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val gs = rows.groupBy(_._1).values.toArray
    val pooledB = {
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum; val sxy = rows.map(r => r._2 * r._3).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    assert(math.abs(m.bRe - pooledB) < 0.02,
      s"near-zero theta should approach pooled OLS: ${m.bRe} vs $pooledB")
    assert(gs.length === 30)
  }

  test("RandomEffects k=2: dense replica parity at 1e-8, k-dim Hausman") {
    // two regressors with distinct within/between structure
    val rows = for (g <- 0 until 40; i <- 0 until 8) yield {
      val x1 = math.sin(g * 1.7 + i * 0.9) * 2 + g * 0.05
      val x2 = math.cos(g * 0.7 + i * 1.3) + g * 0.02
      val u = 1.5 * math.cos(g * 2.3)
      val e = 0.3 * math.sin(g * 5.1 + i * 3.7)
      (s"g$g", x1, x2, 2.0 * x1 - 1.0 * x2 + u + e)
    }
    val df = rows.toDF("g", "x1", "x2", "y")
    val m = RandomEffects.fit(df, "y", Seq("x1", "x2"), "g")
    assert(m.hausmanDf === 2)
    assert(m.n === 320L && m.groups === 40L)

    // dense driver replica of the identical closed-form chain
    val data = rows.toArray
    val byG = data.groupBy(_._1).values.toArray
    val gcnt = byG.length.toDouble
    val nTot = data.length.toDouble
    def stats(grp: Array[(String, Double, Double, Double)]) = {
      val tn = grp.length.toDouble
      val sx = Array(grp.map(_._2).sum, grp.map(_._3).sum)
      val sy = grp.map(_._4).sum
      val sxx = Array.tabulate(2, 2)((i, j) =>
        grp.map(r => (if (i == 0) r._2 else r._3) * (if (j == 0) r._2 else r._3)).sum)
      val sxy = Array.tabulate(2)(i => grp.map(r => (if (i == 0) r._2 else r._3) * r._4).sum)
      val syy = grp.map(r => r._4 * r._4).sum
      (tn, sx, sy, sxx, sxy, syy)
    }
    val gs = byG.map(stats)
    val wxx = Array.tabulate(2, 2)((i, j) =>
      gs.map { case (tn, sx, _, sxx, _, _) => sxx(i)(j) - sx(i) * sx(j) / tn }.sum)
    val wxy = Array.tabulate(2)(i =>
      gs.map { case (tn, sx, sy, _, sxy, _) => sxy(i) - sx(i) * sy / tn }.sum)
    val wyy = gs.map { case (tn, _, sy, _, _, syy) => syy - sy * sy / tn }.sum
    val bFe = LinAlg.solve(wxx, wxy)
    assert(math.abs(m.bFe(0) - bFe(0)) < 1e-8 && math.abs(m.bFe(1) - bFe(1)) < 1e-8,
      s"FE parity: ${m.bFe.toSeq} vs ${bFe.toSeq}")
    val sigE2 = (wyy - bFe(0) * wxy(0) - bFe(1) * wxy(1)) / (nTot - gcnt - 2.0)
    assert(math.abs(m.sigmaE - math.sqrt(sigE2)) < 1e-8)
    // between (centered group means)
    val mx = gs.map { case (tn, sx, _, _, _, _) => Array(sx(0) / tn, sx(1) / tn) }
    val my = gs.map { case (tn, _, sy, _, _, _) => sy / tn }
    val bvxx = Array.tabulate(2, 2)((i, j) =>
      mx.map(v => v(i) * v(j)).sum - mx.map(_(i)).sum * mx.map(_(j)).sum / gcnt)
    val bvxy = Array.tabulate(2)(i =>
      mx.zip(my).map { case (v, w) => v(i) * w }.sum - mx.map(_(i)).sum * my.sum / gcnt)
    val bvyy = my.map(v => v * v).sum - my.sum * my.sum / gcnt
    val bB = LinAlg.solve(bvxx, bvxy)
    val sig2B = (bvyy - bB(0) * bvxy(0) - bB(1) * bvxy(1)) / (gcnt - 3.0)
    val tHar = gcnt / gs.map { case (tn, _, _, _, _, _) => 1.0 / tn }.sum
    val sigU2 = math.max(0.0, sig2B - sigE2 / tHar)
    assert(math.abs(m.sigmaU - math.sqrt(sigU2)) < 1e-8, s"${m.sigmaU} vs ${math.sqrt(sigU2)}")
    // θ-transformed GLS (balanced panel: single θ)
    val gls = gs.map { case (tn, sx, sy, sxx, sxy, syy) =>
      val th = 1.0 - math.sqrt(sigE2 / (tn * sigU2 + sigE2))
      val sh = 2.0 * th - th * th
      val om = (1.0 - th) * (1.0 - th)
      (Array.tabulate(2, 2)((i, j) => sxx(i)(j) - sh * sx(i) * sx(j) / tn),
        Array.tabulate(2)(i => sxy(i) - sh * sx(i) * sy / tn),
        Array.tabulate(2)(i => om * sx(i)), om * sy, tn * om)
    }
    val txx = Array.tabulate(2, 2)((i, j) => gls.map(_._1(i)(j)).sum)
    val txy = Array.tabulate(2)(i => gls.map(_._2(i)).sum)
    val tix = Array.tabulate(2)(i => gls.map(_._3(i)).sum)
    val tiy = gls.map(_._4).sum
    val tii = gls.map(_._5).sum
    val txxC = Array.tabulate(2, 2)((i, j) => txx(i)(j) - tix(i) * tix(j) / tii)
    val txyC = Array.tabulate(2)(i => txy(i) - tix(i) * tiy / tii)
    val bRe = LinAlg.solve(txxC, txyC)
    assert(math.abs(m.bRe(0) - bRe(0)) < 1e-8 && math.abs(m.bRe(1) - bRe(1)) < 1e-8,
      s"RE parity: ${m.bRe.toSeq} vs ${bRe.toSeq}")
    val aRe = (tiy - bRe(0) * tix(0) - bRe(1) * tix(1)) / tii
    assert(math.abs(m.icept - aRe) < 1e-8)
    // k-dim Hausman quadratic form
    val vFe = LinAlg.inverse(wxx).map(_.map(_ * sigE2))
    val vRe = LinAlg.inverse(txxC).map(_.map(_ * sigE2))
    val dV = Array.tabulate(2, 2)((i, j) => vFe(i)(j) - vRe(i)(j))
    val dB = Array.tabulate(2)(i => bFe(i) - bRe(i))
    val hRef = LinAlg.dot(dB, LinAlg.solve(dV, dB))
    if (!m.hausman.isNaN) {
      assert(math.abs(m.hausman - hRef) < 1e-8, s"${m.hausman} vs $hRef")
      // exogenous effects by construction: no rejection at χ²(2) 5%
      assert(m.hausman < 5.99, s"H ${m.hausman}")
      assert(m.pValue > 0.05)
    }
    // k=1 overload must equal the general path exactly
    val m1 = RandomEffects.fit(df, "y", "x1", "g")
    val mk1 = RandomEffects.fit(df, "y", Seq("x1"), "g")
    assert(m1.bRe === mk1.bRe(0) && m1.bFe === mk1.bFe(0) && m1.hausman === mk1.hausman)
  }

  test("RandomEffects k=2: chiSqUpperTail recurrence matches known values") {
    import graft.functions.NormalDist.chiSqUpperTail
    // χ²(2): Q(x) = e^(-x/2) exactly
    assert(math.abs(chiSqUpperTail(5.99, 2) - math.exp(-5.99 / 2)) < 1e-15)
    // χ²(4) at x=9.49 ≈ 0.05 (the textbook 5% critical value)
    assert(math.abs(chiSqUpperTail(9.488, 4) - 0.05) < 1e-3)
    // χ²(1) reproduces the portable-Φ bits: 2(1−Φ(√x))
    val x = 3.841
    val viaPhi = 2.0 * graft.functions.NormalDist.upperTail(math.sqrt(x))
    assert(chiSqUpperTail(x, 1) === viaPhi)
    assert(math.abs(chiSqUpperTail(x, 1) - 0.05) < 1e-3)
    // χ²(3) at 7.815 ≈ 0.05 and χ²(5) at 11.07 ≈ 0.05 (odd recurrence)
    assert(math.abs(chiSqUpperTail(7.815, 3) - 0.05) < 1e-3)
    assert(math.abs(chiSqUpperTail(11.070, 5) - 0.05) < 1e-3)
    // monotone in x, bounded
    assert(chiSqUpperTail(0.0, 3) === 1.0)
    assert(chiSqUpperTail(100.0, 3) < 1e-15)
  }

  test("UnitRoot.dickeyFuller: random walk fails to reject; AR(0.5) rejects") {
    // seeded gaussian innovations: a SUM of sin(kθ) terms is bounded
    // (almost-periodic), i.e. secretly stationary — a genuine random
    // walk needs independent increments
    val rng = new scala.util.Random(42)
    val innov = Array.fill(301)(rng.nextGaussian())
    val walk = Iterator.iterate((0, 0.0)) { case (i, y) => (i + 1, y + innov(i + 1)) }
      .take(300).map { case (i, y) => (i.toLong, y) }.toSeq
    val wr = UnitRoot.dickeyFuller(walk.toDF("t", "y"), "t", "y")
    assert(!wr.reject5pct, s"random walk must not reject: t=${wr.tStat}")
    val ar = Iterator.iterate((0, 0.0)) { case (i, y) => (i + 1, 0.5 * y + innov(i + 1)) }
      .take(300).map { case (i, y) => (i.toLong, y) }.toSeq
    val arr = UnitRoot.dickeyFuller(ar.toDF("t", "y"), "t", "y")
    assert(arr.reject5pct, s"AR(0.5) must reject the unit root: t=${arr.tStat}")
    assert(arr.rho < -0.3, s"rho should be near phi-1=-0.5: ${arr.rho}")
    assert(arr.nObs === 299L)
  }

  test("UnitRoot.kpss: stationary AR accepts, random walk rejects — the null flipped vs DF") {
    val rng = new scala.util.Random(42)
    val innov = Array.fill(301)(rng.nextGaussian())
    val ar = Iterator.iterate((0, 0.0)) { case (i, y) => (i + 1, 0.5 * y + innov(i + 1)) }
      .take(300).map { case (i, y) => (i.toLong, y) }.toSeq
    val ka = UnitRoot.kpss(ar.toDF("t", "y"), "t", "y", lags = 4)
    assert(!ka.reject5pct, s"stationary AR must not reject stationarity: ${ka.stat}")
    val walk = Iterator.iterate((0, 0.0)) { case (i, y) => (i + 1, y + innov(i + 1)) }
      .take(300).map { case (i, y) => (i.toLong, y) }.toSeq
    val kw = UnitRoot.kpss(walk.toDF("t", "y"), "t", "y", lags = 4)
    assert(kw.reject5pct, s"random walk must reject stationarity: ${kw.stat}")
    assert(ka.nObs === 300L && ka.lags === 4)
    assert(ka.sigma2Lr > 0.0)
    // lags=0 degenerates to gamma0 only
    val k0 = UnitRoot.kpss(ar.toDF("t", "y"), "t", "y", lags = 0)
    assert(k0.sigma2Lr > 0.0 && math.abs(k0.sigma2Lr - ka.sigma2Lr) > 1e-9,
      "Bartlett terms must actually contribute")
  }

  test("UnitRoot.dickeyFuller: gaps in t simply contribute no pair") {
    val s = Seq((0L, 1.0), (1L, 2.0), (2L, 1.5), (10L, 9.0), (11L, 8.0), (12L, 8.5))
    val r = UnitRoot.dickeyFuller(s.toDF("t", "y"), "t", "y")
    assert(r.nObs === 4L) // (1,2),(2,?) wait: pairs at t=1,2,11,12
  }

  test("UnitRoot.ljungBox: white noise accepts, AR(0.6) rejects; dense replica parity") {
    val rng = new scala.util.Random(7)
    val noise = (0 until 300).map(i => (i.toLong, rng.nextGaussian()))
    val lbN = UnitRoot.ljungBox(noise.toDF("t", "y"), "t", "y", lags = 6)
    assert(!lbN.reject5pct, s"white noise must not reject: Q=${lbN.qStat} p=${lbN.pValue}")
    val innov = Array.fill(301)(rng.nextGaussian())
    val ar = Iterator.iterate((0, 0.0)) { case (i, y) => (i + 1, 0.6 * y + innov(i + 1)) }
      .take(300).map { case (i, y) => (i.toLong, y) }.toSeq
    val lbA = UnitRoot.ljungBox(ar.toDF("t", "y"), "t", "y", lags = 6)
    assert(lbA.reject5pct && lbA.pValue < 0.01, s"AR must reject: Q=${lbA.qStat}")
    // dense replica of the exact chain
    val ys = ar.map(_._2).toArray
    val n = ys.length.toDouble
    val yb = ys.sum / n
    val e = ys.map(_ - yb)
    val g0 = e.map(v => v * v).sum
    var q = 0.0
    for (k <- 1 to 6) {
      val gk = (k until e.length).map(t => e(t) * e(t - k)).sum
      val r = gk / g0
      q += r * r / (n - k)
    }
    val stat = n * (n + 2.0) * q
    assert(math.abs(lbA.qStat - stat) < 1e-8, s"${lbA.qStat} vs $stat")
    assert(lbA.nObs === 300L && lbA.lags === 6)
    // degenerate guards
    intercept[IllegalArgumentException](
      UnitRoot.ljungBox(Seq((0L, 1.0), (1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0),
        (5L, 1.0), (6L, 1.0), (7L, 1.0)).toDF("t", "y"), "t", "y", lags = 6))
  }

  test("Hac.neweyWest: dense replica parity; NW widens SEs under serial correlation") {
    // trend + AR(0.8) errors: the textbook case where OLS SEs lie
    val rng = new scala.util.Random(11)
    var u = 0.0
    val rows = (0 until 400).map { t =>
      u = 0.8 * u + rng.nextGaussian()
      (t.toLong, t.toDouble, 1.5 + 0.02 * t + u)
    }
    val df = rows.toDF("t", "x", "y")
    val m = Hac.neweyWest(df, "t", "y", Seq("x"), lags = 4)
    assert(m.names === Seq("(intercept)", "x"))
    assert(math.abs(m.coef(1) - 0.02) < 0.01, s"trend ${m.coef(1)}")
    // serial correlation inflates the NW SE over the naive OLS SE
    assert(m.seNw(1) > 1.5 * m.seOls(1),
      s"NW must widen the slope SE: ${m.seNw(1)} vs ${m.seOls(1)}")
    // dense replica of the whole sandwich
    val xs = rows.map(_._2).toArray
    val ys = rows.map(_._3).toArray
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    assert(math.abs(m.coef(0) - b0) < 1e-8 && math.abs(m.coef(1) - b1) < 1e-8)
    val res = xs.zip(ys).map { case (x, y) => y - b0 - b1 * x }
    val s = Array.ofDim[Double](2, 2)
    def xv(t: Int, i: Int) = if (i == 0) 1.0 else xs(t)
    for (i <- 0 to 1; j <- 0 to 1)
      s(i)(j) = res.indices.map(t => res(t) * res(t) * xv(t, i) * xv(t, j)).sum
    for (l <- 1 to 4) {
      val w = 1.0 - l / 5.0
      val g = Array.tabulate(2, 2)((i, j) =>
        (l until res.length).map(t => res(t) * res(t - l) * xv(t, i) * xv(t - l, j)).sum)
      for (i <- 0 to 1; j <- 0 to 1) s(i)(j) += w * (g(i)(j) + g(j)(i))
    }
    val gram = Array(Array(n, sx), Array(sx, sxx))
    val inv = LinAlg.inverse(gram)
    val v = LinAlg.matMul(LinAlg.matMul(inv, s), inv)
    assert(math.abs(m.seNw(0) - math.sqrt(v(0)(0))) < 1e-8)
    assert(math.abs(m.seNw(1) - math.sqrt(v(1)(1))) < 1e-8)
    // lags = 0 degenerates to plain HC0
    val m0 = Hac.neweyWest(df, "t", "y", Seq("x"), lags = 0)
    assert(m0.seNw(1) < m.seNw(1), "Bartlett terms must contribute under AR errors")
  }

  test("Hac.cochraneOrcutt: AR(1) errors — rho recovered, slope de-biased SE, dense parity") {
    val rng = new scala.util.Random(3)
    var u = 0.0
    val rows = (0 until 500).map { t =>
      u = 0.7 * u + rng.nextGaussian()
      (t.toLong, t.toDouble, 2.0 + 0.05 * t + u)
    }
    val df = rows.toDF("t", "x", "y")
    val m = Hac.cochraneOrcutt(df, "t", "y", "x")
    assert(m.converged, s"must converge: iters=${m.iters}")
    assert(math.abs(m.rho - 0.7) < 0.1, s"rho ${m.rho}")
    assert(math.abs(m.b1 - 0.05) < 0.01, s"slope ${m.b1}")
    assert(m.nPairs === 499L)
    // dense replica of the full iteration
    val xs = rows.map(_._2).toArray; val ys = rows.map(_._3).toArray
    def ols(xv: Array[Double], yv: Array[Double]): (Double, Double) = {
      val n = xv.length.toDouble
      val sx = xv.sum; val sy = yv.sum
      val sxx = xv.map(v => v * v).sum
      val sxy = xv.zip(yv).map { case (a, b) => a * b }.sum
      val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      ((sy - b1 * sx) / n, b1)
    }
    var (db0, db1) = ols(xs, ys)
    var drho = 0.0
    var it = 0; var dn = false
    while (it < 50 && !dn) {
      val res = xs.indices.map(t => ys(t) - db0 - db1 * xs(t))
      val num = (1 until res.length).map(t => res(t) * res(t - 1)).sum
      val den = (1 until res.length).map(t => res(t - 1) * res(t - 1)).sum
      val rho2 = num / den
      val ysT = (1 until xs.length).map(t => ys(t) - rho2 * ys(t - 1)).toArray
      val xsT = (1 until xs.length).map(t => xs(t) - rho2 * xs(t - 1)).toArray
      val (a, b) = ols(xsT, ysT)
      db1 = b; db0 = a / (1.0 - rho2)
      dn = math.abs(rho2 - drho) < 1e-8
      drho = rho2; it += 1
    }
    assert(math.abs(m.rho - drho) < 1e-8, s"${m.rho} vs $drho")
    assert(math.abs(m.b1 - db1) < 1e-8 && math.abs(m.b0 - db0) < 1e-6)
    assert(m.iters === it)
    // guard: an exactly-linear series leaves zero lagged residuals — raises
    val exact = (0 until 100).map { t => (t.toLong, t.toDouble, 2.0 * t) }
    intercept[IllegalArgumentException](
      Hac.cochraneOrcutt(exact.toDF("t", "x", "y"), "t", "y", "x"))
  }

  test("Hac.breuschGodfrey: AR errors reject, white noise accepts; dense replica incl. p=2") {
    val rng = new scala.util.Random(19)
    var u = 0.0
    val arRows = (0 until 400).map { t =>
      u = 0.6 * u + rng.nextGaussian()
      (t.toLong, t.toDouble, 1.0 + 0.01 * t + u)
    }
    val ar = Hac.breuschGodfrey(arRows.toDF("t", "x", "y"), "t", "y", Seq("x"), lags = 2)
    assert(ar.reject5pct && ar.pValue < 0.01, s"AR(0.6) must reject: LM=${ar.lm}")
    val wnRows = (0 until 400).map { t =>
      (t.toLong, t.toDouble, 1.0 + 0.01 * t + rng.nextGaussian())
    }
    val wn = Hac.breuschGodfrey(wnRows.toDF("t", "x", "y"), "t", "y", Seq("x"), lags = 2)
    assert(!wn.reject5pct, s"white noise must not reject: LM=${wn.lm} p=${wn.pValue}")
    // dense replica at p = 2 (beyond the oracle's p = 1)
    val xs = arRows.map(_._2).toArray; val ys = arRows.map(_._3).toArray
    val n = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxx = xs.map(v => v * v).sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    val res = xs.indices.map(t => ys(t) - b0 - b1 * xs(t)).toArray
    val rows = (2 until res.length).map(t => (res(t), Array(1.0, xs(t), res(t - 1), res(t - 2))))
    val g = Array.ofDim[Double](4, 4); val c = new Array[Double](4)
    rows.foreach { case (uu, xv) =>
      for (i <- 0 to 3; j <- 0 to 3) g(i)(j) += xv(i) * xv(j)
      for (i <- 0 to 3) c(i) += xv(i) * uu
    }
    val a = LinAlg.solve(g, c)
    val nAux = rows.length.toDouble
    val ub = rows.map(_._1).sum / nAux
    val sst = rows.map(r => (r._1 - ub) * (r._1 - ub)).sum
    val ssr = rows.map { case (uu, xv) =>
      val f = xv.zip(a).map { case (p, q) => p * q }.sum
      (uu - f) * (uu - f)
    }.sum
    val lmRef = nAux * (1.0 - ssr / sst)
    assert(math.abs(ar.lm - lmRef) < 1e-6 * lmRef, s"${ar.lm} vs $lmRef")
    assert(ar.nAux === 398L && ar.lags === 2)
    intercept[IllegalArgumentException](
      Hac.breuschGodfrey(arRows.toDF("t", "x", "y"), "t", "y", Seq("x"), lags = 0))
  }

  test("Causal.rdd: planted jump recovered, slopes recovered, kernel respected") {
    // y = 3 + 0.5·r below the cutoff, y = 10 + 0.5·r above → τ = 7
    val rows = (0 until 4000).map { i =>
      val r = (i % 200) / 10.0 - 10.0 // running in [-10, 9.9]
      val jump = if (r >= 0) 7.0 else 0.0
      val e = 0.05 * math.sin(i * 1.3)
      (r, 3.0 + 0.5 * r + jump + e)
    }
    val out = Causal.rdd(rows.toDF("r", "y"), "y", "r", cutoff = 0.0, bandwidth = 5.0)
      .head()
    assert(math.abs(out.getAs[Double]("tau") - 7.0) < 0.05, out.toString)
    assert(math.abs(out.getAs[Double]("slope_left") - 0.5) < 0.05)
    assert(math.abs(out.getAs[Double]("slope_right") - 0.5) < 0.05)
    // bandwidth 5 keeps only |r| ≤ 5: half the grid on each side
    assert(out.getAs[Long]("n_left") > 0 && out.getAs[Long]("n_right") > 0)
    assert(out.getAs[Long]("n_left") + out.getAs[Long]("n_right") <= 4000 / 2 + 40)
  }

  test("Causal.rdd: guards — bad bandwidth and empty side raise") {
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)).toDF("r", "y")
    intercept[IllegalArgumentException](Causal.rdd(df, "y", "r", 0.0, -1.0))
    // all points on the right side → left fit must raise, not return garbage
    intercept[IllegalArgumentException](Causal.rdd(df, "y", "r", 0.0, 10.0))
  }
}
