package graft.ml

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GLM/IRLS specs. The anchor is an INDEPENDENT dense IRLS implemented
  * here with explicit row loops (same canonical-link math, no Spark, no
  * shared aggregation code) — the distributed fits must reproduce its
  * coefficients, information SEs, deviance, and sandwich variances.
  */
class GlmSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent dense IRLS ------------------------------------------

  /** family: "poisson" | "binomial". X rows WITHOUT intercept; one is
    * prepended here. Returns (beta, X'WX, deviance, iters).
    */
  private def denseIrls(
      xRaw: Array[Array[Double]],
      y: Array[Double],
      family: String,
      tol: Double = 1e-9,
      maxIter: Int = 30,
      offset: Array[Double] = null
  ): (Array[Double], Array[Array[Double]], Double, Int) = {
    val n = y.length
    val x = xRaw.map(r => 1.0 +: r)
    val k = x.head.length
    val offs = if (offset == null) Array.fill(n)(0.0) else offset
    val ybar = y.sum / n
    def clip(e: Double) = math.max(-30.0, math.min(30.0, e))
    def phiScalar(v: Double): Double = {
      import graft.functions.NormalDist._
      val ax = math.abs(v)
      val t = 1.0 / (1.0 + P * ax)
      val pdf = INV_SQRT_2PI * math.exp(-(ax * ax) / 2.0)
      val poly = t * (B1 + t * (B2 + t * (B3 + t * (B4 + t * B5))))
      val up = 1.0 - pdf * poly
      if (v >= 0) up else 1.0 - up
    }
    def clip8(e: Double) = math.max(-8.0, math.min(8.0, e))
    def npdf(e: Double) =
      graft.functions.NormalDist.INV_SQRT_2PI * math.exp(-(clip8(e) * clip8(e)) / 2.0)
    def mu(eta: Double) = family match {
      case "poisson" | "gamma" => math.exp(clip(eta))
      case "binomial"          => 1.0 / (1.0 + math.exp(-clip(eta)))
      case "probit" =>
        math.min(1.0 - 1e-12, math.max(1e-12, phiScalar(clip8(eta))))
      case "cloglog" =>
        val e = math.max(-30.0, math.min(3.4, eta))
        math.min(1.0 - 1e-12, math.max(1e-12, 1.0 - math.exp(-math.exp(e))))
    }
    def devTerm(yi: Double, m: Double) = family match {
      case "poisson" =>
        2.0 * ((if (yi > 0) yi * math.log(yi / m) else 0.0) - (yi - m))
      case "binomial" | "cloglog" | "probit" =>
        -2.0 * ((if (yi > 0) yi * math.log(m) else 0.0) +
          (if (yi < 1) (1 - yi) * math.log(1 - m) else 0.0))
      case "gamma" =>
        2.0 * (-math.log(yi / m) + (yi - m) / m)
    }
    def etaInit(yi: Double) = family match {
      case "poisson" | "gamma" => math.log((yi + ybar) / 2.0)
      case "binomial"          => { val m = (yi + 0.5) / 2.0; math.log(m / (1 - m)) }
      case "probit"            => { val m = (yi + 0.5) / 2.0; math.log(m / (1 - m)) / 1.702 }
      case "cloglog"           => { val m = (yi + 0.5) / 2.0; math.log(-math.log(1 - m)) }
    }

    var beta: Array[Double] = null
    var dev = Double.MaxValue
    var g: Array[Array[Double]] = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val eta = Array.tabulate(n) { i =>
        if (beta == null) etaInit(y(i))
        else (0 until k).map(j => x(i)(j) * beta(j)).sum + offs(i)
      }
      val m = eta.map(mu)
      val w = family match {
        case "poisson"  => m
        case "binomial" => m.map(v => v * (1 - v))
        case "gamma"    => Array.fill(n)(1.0)
        case "cloglog"  => m.map { v => val l = math.log(1 - v); (1 - v) * l * l / v }
        case "probit" =>
          Array.tabulate(n) { i => val p = npdf(eta(i)); p * p / (m(i) * (1 - m(i))) }
      }
      // z uses dη/dμ, which equals 1/w only for canonical links
      val dmde = family match {
        case "gamma"   => m
        case "cloglog" => m.map(v => -(1 - v) * math.log(1 - v))
        case "probit"  => Array.tabulate(n)(i => npdf(eta(i)))
        case _         => w
      }
      val z = Array.tabulate(n)(i => eta(i) + (y(i) - m(i)) / dmde(i) - offs(i))
      g = Array.ofDim[Double](k, k)
      val c = Array.ofDim[Double](k)
      for (i <- 0 until n; a <- 0 until k) {
        c(a) += w(i) * x(i)(a) * z(i)
        for (b <- 0 until k) g(a)(b) += w(i) * x(i)(a) * x(i)(b)
      }
      val devNow = (0 until n).map(i => devTerm(y(i), m(i))).sum
      val betaNew = LinAlg.solve(g.map(_.clone()), c)
      converged = beta != null && math.abs(devNow - dev) / (math.abs(devNow) + 0.1) < tol
      beta = betaNew
      dev = devNow
      iter += 1
    }
    (beta, g, dev, iter)
  }

  /** Dense sandwich at the converged fit: bread⁻¹ meat bread⁻¹, meat from
    * per-cluster score sums (clusters = singletons for HC0).
    */
  private def denseSandwich(
      xRaw: Array[Array[Double]],
      y: Array[Double],
      beta: Array[Double],
      gramW: Array[Array[Double]],
      family: String,
      clusters: Array[Int]
  ): Array[Array[Double]] = {
    val x = xRaw.map(r => 1.0 +: r)
    val k = x.head.length
    def clip(e: Double) = math.max(-30.0, math.min(30.0, e))
    def mu(eta: Double) = family match {
      case "poisson" | "gamma" => math.exp(clip(eta))
      case "binomial"          => 1.0 / (1.0 + math.exp(-clip(eta)))
      case "cloglog" =>
        val e = math.max(-30.0, math.min(3.4, eta))
        math.min(1.0 - 1e-12, math.max(1e-12, 1.0 - math.exp(-math.exp(e))))
    }
    val scores = scala.collection.mutable.Map[Int, Array[Double]]()
    for (i <- y.indices) {
      val eta = (0 until k).map(j => x(i)(j) * beta(j)).sum
      // score residual (y − μ)·(dμ/dη)/V(μ): y − μ canonical, (y − μ)/μ
      // gamma-log, −(y − μ)·ln(1−μ)/μ cloglog
      val u0 = y(i) - mu(eta)
      val u = family match {
        case "gamma"   => u0 / mu(eta)
        case "cloglog" => val m = mu(eta); u0 * (-(1 - m) * math.log(1 - m)) / (m * (1 - m))
        case _         => u0
      }
      val s = scores.getOrElseUpdate(clusters(i), Array.ofDim[Double](k))
      for (a <- 0 until k) s(a) += u * x(i)(a)
    }
    val meat = Array.ofDim[Double](k, k)
    for (s <- scores.values; a <- 0 until k; b <- 0 until k) meat(a)(b) += s(a) * s(b)
    val inv = LinAlg.inverse(gramW)
    LinAlg.matMul(LinAlg.matMul(inv, meat), inv)
  }

  private def rpois(lambda: Double, rng: Random): Double = {
    val l = math.exp(-lambda)
    var kk = 0
    var p = 1.0
    while ({ kk += 1; p *= rng.nextDouble(); p > l }) ()
    (kk - 1).toDouble
  }

  // deterministic Poisson panel: x, two FEs, y ~ Pois(exp(.4x + a_g + b_h))
  private lazy val panel: Seq[(Double, String, String, Double)] = {
    val rng = new Random(20260813L)
    val aEff = Map("g0" -> 0.0, "g1" -> 0.6, "g2" -> -0.4, "g3" -> 0.9)
    val bEff = Map("h0" -> 0.0, "h1" -> -0.5, "h2" -> 0.3)
    for (i <- 0 until 240) yield {
      val g = s"g${i % 4}"
      val h = s"h${(i / 4) % 3}"
      val x = math.sin(i * 0.37) * 1.5
      val lam = math.exp(0.4 * x + aEff(g) + bEff(h))
      (x, g, h, rpois(lam, rng))
    }
  }

  test("Gaussian-identity IRLS reproduces OLS exactly (one-step fixpoint)") {
    val rows = for (i <- 0 until 60)
      yield (math.sin(i * 1.3) * 2, math.cos(i * 0.7), 1.0 + 2.0 * math.sin(i * 1.3) * 2 - 0.5 * math.cos(i * 0.7) + math.sin(i * 5.1) * 0.1)
    val df = rows.toDF("a", "b", "y")
    val ols = Ols.fit(df, "y", Seq("a", "b"))
    val glm = Glm.fit(df, "y", Seq("a", "b"), Glm.Gaussian)
    assert(glm.converged)
    ols.coef.zip(glm.coef).foreach { case (o, g) => assert(math.abs(o - g) < 1e-10) }
    assert(math.abs(glm.deviance - ols.ssr) < 1e-8)
  }

  test("Poisson GLM matches the independent dense IRLS (coef, SE, deviance, iters)") {
    val rng = new Random(7L)
    val data = for (i <- 0 until 300) yield {
      val x1 = math.sin(i * 0.61) * 1.2
      val x2 = math.cos(i * 1.13)
      (x1, x2, rpois(math.exp(0.5 + 0.3 * x1 - 0.6 * x2), rng))
    }
    val df = data.toDF("x1", "x2", "y")
    val m = Glm.poisson(df, "y", Seq("x1", "x2"))
    val (bD, gD, devD, itD) = denseIrls(
      data.map(d => Array(d._1, d._2)).toArray, data.map(_._3).toArray, "poisson")
    assert(m.converged)
    assert(m.iters == itD)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(math.abs(m.deviance - devD) < 1e-7)
    val seD = LinAlg.inverse(gD).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
    m.seInformation.zip(seD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // true parameters recovered within a few SEs on this draw
    assert(math.abs(m.coef(1) - 0.3) < 4 * m.seInformation(1))
    assert(math.abs(m.coef(2) + 0.6) < 4 * m.seInformation(2))
  }

  test("gamma-log GLM (non-canonical link) matches the independent dense IRLS + sandwich") {
    // strictly positive, right-skewed outcome: y = exp(0.8 + 0.5x) · e^ε
    val rows = (0 until 200).map { i =>
      val x = math.sin(i * 0.41) * 1.2
      val eps = 0.4 * math.sin(i * 1.7 + 0.3) // deterministic, mean ~0
      (x, math.exp(0.8 + 0.5 * x + eps), s"c${i % 8}")
    }
    val df = rows.toDF("x", "y", "cl")
    val m = Glm.gamma(df, "y", Seq("x"))
    val (bD, gD, devD, itD) = denseIrls(
      rows.map(r => Array(r._1)).toArray, rows.map(_._2).toArray, "gamma")
    assert(m.converged && m.iters == itD)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-10, s"$a vs $b") }
    assert(math.abs(m.deviance - devD) / devD < 1e-10)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(m.gramW(a)(b) - gD(a)(b)) / math.abs(gD(a)(b)) < 1e-9)
    // coefficient recovery sanity on the planted slope
    assert(math.abs(m.coef(1) - 0.5) < 0.05, m.coef.mkString(","))
    // robust + clustered sandwiches use the (y − μ)/μ score residual
    val vR = Glm.varianceRobust(df, m, "y")
    val vRd = denseSandwich(rows.map(r => Array(r._1)).toArray, rows.map(_._2).toArray,
      m.coef, m.gramW, "gamma", rows.indices.toArray)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(vR(a)(b) - vRd(a)(b)) / math.abs(vRd(a)(b)) < 1e-8)
    val vC = Glm.varianceRobust(df, m, "y", cluster = Some("cl"))
    val vCd = denseSandwich(rows.map(r => Array(r._1)).toArray, rows.map(_._2).toArray,
      m.coef, m.gramW, "gamma", rows.map(_._3.drop(1).toInt).toArray)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(vC(a)(b) - vCd(a)(b)) / math.abs(vCd(a)(b)) < 1e-8)
  }

  test("logistic GLM matches the independent dense IRLS") {
    val data = for (i <- 0 until 400) yield {
      val x = math.sin(i * 0.77) * 2
      // deterministic threshold draw: uniform via hash-free recurrence
      val u = (math.sin(i * 12.9898) * 43758.5453) % 1.0
      val p = 1.0 / (1.0 + math.exp(-(-0.3 + 1.1 * x)))
      (x, if (math.abs(u) < p) 1.0 else 0.0)
    }
    val df = data.toDF("x", "y")
    val m = Glm.logistic(df, "y", Seq("x"))
    val (bD, gD, devD, _) = denseIrls(
      data.map(d => Array(d._1)).toArray, data.map(_._2).toArray, "binomial")
    assert(m.converged)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(math.abs(m.deviance - devD) < 1e-7)
    val seD = LinAlg.inverse(gD).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
    m.seInformation.zip(seD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("probit GLM matches dense IRLS; recovers planted latent-normal coefficients; mu(0)=0.5") {
    def phiS(v: Double): Double = {
      import graft.functions.NormalDist._
      val ax = math.abs(v)
      val t = 1.0 / (1.0 + P * ax)
      val pdf = INV_SQRT_2PI * math.exp(-(ax * ax) / 2.0)
      val up = 1.0 - pdf * (t * (B1 + t * (B2 + t * (B3 + t * (B4 + t * B5)))))
      if (v >= 0) up else 1.0 - up
    }
    val data = for (i <- 0 until 600) yield {
      val x = math.sin(i * 0.77) * 1.5
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val p = phiS(-0.4 + 0.8 * x)
      (x, if (u < p) 1.0 else 0.0)
    }
    val df = data.toDF("x", "y")
    val m = Glm.probit(df, "y", Seq("x"))
    val (bD, gD, devD, itD) = denseIrls(
      data.map(d => Array(d._1)).toArray, data.map(_._2).toArray, "probit")
    assert(m.converged && m.iters == itD)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    assert(math.abs(m.deviance - devD) < 1e-7)
    val seD = LinAlg.inverse(gD).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
    m.seInformation.zip(seD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // planted (−0.4, 0.8) recovered on the probit scale
    assert(math.abs(m.coef(0) + 0.4) < 0.2, m.coef.mkString(","))
    assert(math.abs(m.coef(1) - 0.8) < 0.2, m.coef.mkString(","))
    // the same data's logit slope sits near 1.702x the probit slope
    val lg = Glm.logistic(df, "y", Seq("x"))
    val ratio = lg.coef(1) / m.coef(1)
    assert(ratio > 1.4 && ratio < 2.0, s"logit/probit slope ratio $ratio")
    // mu(0) = Φ(0) = 1/2
    val mu0 = spark.range(1).select(Glm.Probit.mu(lit(0.0))).head().getDouble(0)
    assert(math.abs(mu0 - 0.5) < 1e-7)
    // the mu-only hooks are deliberately unreachable
    intercept[UnsupportedOperationException](Glm.Probit.weight(lit(0.5)))
  }

  test("Heckman two-step: corrects selection bias the naive selected-sample OLS carries") {
    // latent: y* = 1 + 2x + e ; selection s = 1{0.5 + 1.5x + v > 0} with
    // corr(e, v) > 0 via shared component: e = 0.8 v + n. OLS on the
    // selected sample biases the slope; the lambda term absorbs it.
    def phiInv(u: Double): Double = { // crude deterministic normal draws
      // sum of 12 uniforms - 6 (Irwin-Hall) from a hash-free recurrence
      var s = 0.0
      for (j <- 1 to 12) s += math.abs((math.sin((u + j) * 12.9898) * 43758.5453) % 1.0)
      s - 6.0
    }
    val data = for (i <- 0 until 2000) yield {
      val x = math.sin(i * 0.37) * 1.2
      val v = phiInv(i * 0.001)
      val e = 0.8 * v + 0.3 * phiInv(i * 0.001 + 99.0)
      val sel = if (0.5 + 1.5 * x + v > 0) 1.0 else 0.0
      val y = 1.0 + 2.0 * x + e
      (x, y, sel)
    }
    val df = data.toDF("x", "y", "s")
    val out = Heckman.twoStep(df, "y", Seq("x"), "s", Seq("x"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val naive = Ols.fit(data.filter(_._3 > 0.5).toDF("x", "y", "s"), "y", Seq("x"))
    val naiveSlope = naive.coef(1)
    val heckSlope = out(("outcome", "x"))
    // the correction moves the slope toward the truth (2.0) vs naive OLS
    assert(math.abs(heckSlope - 2.0) < math.abs(naiveSlope - 2.0),
      s"heckit $heckSlope vs naive $naiveSlope")
    assert(math.abs(heckSlope - 2.0) < 0.15, s"heckit slope $heckSlope")
    // positive error correlation -> positive lambda coefficient
    assert(out(("outcome", "lambda")) > 0.0)
    // selection stage recovers the probit signs
    assert(out(("selection", "x")) > 0.5)
    assert(out(("selection", "(intercept)")) > 0.0)
  }

  test("Tobit MLE recovers planted censored-normal parameters; beats censored OLS") {
    def ih(u: Double): Double = { // Irwin-Hall(12) - 6 ~ N(0,1), deterministic
      var s = 0.0
      for (j <- 1 to 12) s += math.abs((math.sin((u + j) * 12.9898) * 43758.5453) % 1.0)
      s - 6.0
    }
    val data = for (i <- 0 until 3000) yield {
      val x = math.sin(i * 0.37) * 1.5
      val yStar = 1.0 + 2.0 * x + 0.5 * ih(i * 0.001)
      (x, math.max(yStar, 0.0))
    }
    val censShare = data.count(_._2 == 0.0).toDouble / data.size
    assert(censShare > 0.1 && censShare < 0.6, s"want real censoring, got $censShare")
    val df = data.toDF("x", "y")
    val m = Tobit.fit(df, "y", Seq("x"), lower = 0.0)
    assert(m.converged, s"iters ${m.iters}")
    assert(m.nCensored === data.count(_._2 == 0.0).toLong)
    assert(math.abs(m.beta(0) - 1.0) < 0.1, s"icept ${m.beta(0)}")
    assert(math.abs(m.beta(1) - 2.0) < 0.1, s"slope ${m.beta(1)}")
    assert(math.abs(m.sigma - 0.5) < 0.07, s"sigma ${m.sigma}")
    // naive OLS on the censored outcome attenuates the slope; Tobit must
    // land strictly closer to the truth
    val naive = Ols.fit(df, "y", Seq("x"))
    assert(naive.coef(1) < m.beta(1))
    assert(math.abs(m.beta(1) - 2.0) < math.abs(naive.coef(1) - 2.0))
    // no censoring: Tobit ~ the OLS fit on the same rows
    val clean = data.map { case (x, _) => (x, 10.0 + 2.0 * x + 0.5 * ih(x * 7.0)) }
      .toDF("x", "y")
    val m2 = Tobit.fit(clean, "y", Seq("x"), lower = 0.0)
    val o2 = Ols.fit(clean, "y", Seq("x"))
    assert(m2.nCensored === 0L)
    assert(math.abs(m2.beta(1) - o2.coef(1)) < 1e-4)
  }

  test("ordered logit: J=2 collapses to plain logistic; planted 3-level recovery; monotone cutpoints") {
    // J = 2: P(y = hi) = sigma(x'b - a1) == logistic with icept -a1
    val bin = (0 until 500).map { i =>
      val x = math.sin(i * 0.77) * 2
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val pHi = 1.0 / (1.0 + math.exp(-(-0.3 + 1.1 * x)))
      (x, if (u < pHi) "b_hi" else "a_lo")
    }
    val bdf = bin.toDF("x", "y")
    val m2 = OrderedLogit.fit(bdf, "y", Seq("x"))
    val lg = Glm.logistic(
      bdf.withColumn("y1", (col("y") === "b_hi").cast("double")), "y1", Seq("x"))
    assert(m2.converged)
    assert(math.abs(m2.beta(0) - lg.coef(1)) < 1e-7,
      s"slope ${m2.beta(0)} vs logistic ${lg.coef(1)}")
    assert(math.abs(m2.cutpoints(0) + lg.coef(0)) < 1e-7,
      s"cutpoint ${m2.cutpoints(0)} vs -icept ${-lg.coef(0)}")

    // planted proportional-odds data, 3 levels: alpha = (-1, 1), beta = 1.5
    val tri = (0 until 2000).map { i =>
      val x = math.sin(i * 0.37) * 1.5
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val p1 = 1.0 / (1.0 + math.exp(-(-1.0 - 1.5 * x)))
      val p2 = 1.0 / (1.0 + math.exp(-(1.0 - 1.5 * x)))
      val y = if (u < p1) "g1" else if (u < p2) "g2" else "g3"
      (x, y)
    }
    val m3 = OrderedLogit.fit(tri.toDF("x", "y"), "y", Seq("x"))
    assert(m3.converged, s"iters ${m3.iters}")
    assert(m3.levels === Seq("g1", "g2", "g3"))
    assert(m3.cutpoints(0) < m3.cutpoints(1), "cutpoints must stay ordered")
    assert(math.abs(m3.cutpoints(0) + 1.0) < 0.15, m3.cutpoints.mkString(","))
    assert(math.abs(m3.cutpoints(1) - 1.0) < 0.15, m3.cutpoints.mkString(","))
    assert(math.abs(m3.beta(0) - 1.5) < 0.15, m3.beta.mkString(","))
    // summary frame carries the named rows
    val sm = OrderedLogit.summary(spark, m3).collect()
    assert(sm.count(_.getString(0) == "cutpoint") === 2)
    assert(sm.count(_.getString(0) == "coef") === 1)
  }

  test("multinomial logit: J=2 equals plain logistic; planted 3-class recovery; probabilities sum to 1") {
    // J = 2 with reference = the later sorted level: P(y = a_lo) =
    // sigma(eta_1), so theta_1 == the logistic fit of 1{a_lo}
    val bin = (0 until 500).map { i =>
      val x = math.sin(i * 0.77) * 2
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val pLo = 1.0 / (1.0 + math.exp(-(-0.3 + 1.1 * x)))
      (x, if (u < pLo) "a_lo" else "b_hi")
    }
    val bdf = bin.toDF("x", "y")
    val m2 = Multinomial.fit(bdf, "y", Seq("x"))
    val lg = Glm.logistic(
      bdf.withColumn("y1", (col("y") === "a_lo").cast("double")), "y1", Seq("x"))
    assert(m2.converged)
    assert(math.abs(m2.coef(0)(0) - lg.coef(0)) < 1e-7)
    assert(math.abs(m2.coef(0)(1) - lg.coef(1)) < 1e-7)

    // planted 3-class softmax: theta_1 = (0.5, 1.0), theta_2 = (-0.5, -1.5)
    val tri = (0 until 3000).map { i =>
      val x = math.sin(i * 0.37) * 1.5
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val e1 = math.exp(0.5 + 1.0 * x); val e2 = math.exp(-0.5 - 1.5 * x)
      val d = 1.0 + e1 + e2
      val y = if (u < e1 / d) "c1" else if (u < (e1 + e2) / d) "c2" else "c3"
      (x, y)
    }
    val m3 = Multinomial.fit(tri.toDF("x", "y"), "y", Seq("x"))
    assert(m3.converged, s"iters ${m3.iters}")
    assert(m3.levels === Seq("c1", "c2", "c3"))
    assert(math.abs(m3.coef(0)(0) - 0.5) < 0.15, m3.coef(0).mkString(","))
    assert(math.abs(m3.coef(0)(1) - 1.0) < 0.15, m3.coef(0).mkString(","))
    assert(math.abs(m3.coef(1)(0) + 0.5) < 0.15, m3.coef(1).mkString(","))
    assert(math.abs(m3.coef(1)(1) + 1.5) < 0.15, m3.coef(1).mkString(","))
    // fitted class shares ~ observed shares (softmax calibration at MLE:
    // the intercept score equation forces exact share matching)
    val obsShare = tri.count(_._2 == "c1").toDouble / tri.size
    val fitShare = tri.map { case (x, _) =>
      val e1 = math.exp(m3.coef(0)(0) + m3.coef(0)(1) * x)
      val e2 = math.exp(m3.coef(1)(0) + m3.coef(1)(1) * x)
      e1 / (1.0 + e1 + e2)
    }.sum / tri.size
    assert(math.abs(obsShare - fitShare) < 1e-6, s"$obsShare vs $fitShare")
  }

  test("zero-inflated Poisson: planted (pi, beta) recovery; pure-Poisson data drives pi to ~0") {
    // deterministic ZIP draws: structural zero w.p. 0.3, else Poisson(exp(0.5 + 0.7x))
    def u(i: Int, salt: Double) =
      math.abs((math.sin((i + salt) * 12.9898) * 43758.5453) % 1.0)
    def pois(lam: Double, i: Int): Double = {
      // inverse-CDF Poisson draw from a deterministic uniform
      var p = math.exp(-lam); var cdf = p; var x = 0
      val uu = u(i, 0.31)
      while (cdf < uu && x < 100) { x += 1; p *= lam / x; cdf += p }
      x.toDouble
    }
    val data = (0 until 4000).map { i =>
      val x = math.sin(i * 0.37)
      val lam = math.exp(0.5 + 0.7 * x)
      val y = if (u(i, 7.7) < 0.3) 0.0 else pois(lam, i)
      (x, y)
    }
    val df = data.toDF("x", "y")
    val m = Zip.fit(df, "y", Seq("x"))
    assert(m.converged, s"iters ${m.iters}")
    assert(math.abs(m.pi - 0.3) < 0.05, s"pi ${m.pi}")
    assert(math.abs(m.beta(0) - 0.5) < 0.1, s"icept ${m.beta(0)}")
    assert(math.abs(m.beta(1) - 0.7) < 0.1, s"slope ${m.beta(1)}")
    // plain Poisson data: inflation collapses and slopes match Glm.poisson
    val pure = (0 until 4000).map { i =>
      val x = math.sin(i * 0.37)
      (x, pois(math.exp(0.3 + 0.5 * x), i + 999))
    }.toDF("x", "y")
    val mp = Zip.fit(pure, "y", Seq("x"))
    val gp = Glm.poisson(pure, "y", Seq("x"))
    assert(mp.pi < 0.02, s"pi ${mp.pi}")
    assert(math.abs(mp.beta(1) - gp.coef(1)) < 0.02,
      s"${mp.beta(1)} vs ${gp.coef(1)}")
  }

  test("cloglog GLM (non-canonical link) matches dense IRLS + sandwich; recovers planted hazard") {
    val data = for (i <- 0 until 600) yield {
      val x = math.sin(i * 0.77) * 1.5
      val u = math.abs((math.sin(i * 12.9898) * 43758.5453) % 1.0)
      val p = 1.0 - math.exp(-math.exp(-1.2 + 0.9 * x))
      (x, if (u < p) 1.0 else 0.0, s"c${i % 10}")
    }
    val df = data.toDF("x", "y", "cl")
    val m = Glm.cloglog(df, "y", Seq("x"))
    val (bD, gD, devD, itD) = denseIrls(
      data.map(d => Array(d._1)).toArray, data.map(_._2).toArray, "cloglog")
    assert(m.converged && m.iters == itD)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    assert(math.abs(m.deviance - devD) < 1e-7)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(m.gramW(a)(b) - gD(a)(b)) / math.abs(gD(a)(b)) < 1e-9)
    // planted (a, b) = (−1.2, 0.9) recovered
    assert(math.abs(m.coef(0) + 1.2) < 0.25, m.coef.mkString(","))
    assert(math.abs(m.coef(1) - 0.9) < 0.25, m.coef.mkString(","))
    // robust + clustered sandwiches use the −(y−μ)ln(1−μ)/μ score
    val vR = Glm.varianceRobust(df, m, "y")
    val vRd = denseSandwich(data.map(d => Array(d._1)).toArray, data.map(_._2).toArray,
      m.coef, m.gramW, "cloglog", data.indices.toArray)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(vR(a)(b) - vRd(a)(b)) / math.abs(vRd(a)(b)) < 1e-8)
    val vC = Glm.varianceRobust(df, m, "y", cluster = Some("cl"))
    val vCd = denseSandwich(data.map(d => Array(d._1)).toArray, data.map(_._2).toArray,
      m.coef, m.gramW, "cloglog", data.map(_._3.drop(1).toInt).toArray)
    for (a <- 0 until 2; b <- 0 until 2)
      assert(math.abs(vC(a)(b) - vCd(a)(b)) / math.abs(vCd(a)(b)) < 1e-8)
    // the link really is asymmetric: μ(0) = 1 − e^{−1}, not 0.5
    val mu0 = spark.range(1).select(Glm.Cloglog.mu(lit(0.0))).head().getDouble(0)
    assert(math.abs(mu0 - (1.0 - math.exp(-1.0))) < 1e-12)
  }

  test("Poisson robust and clustered sandwich match the dense computation") {
    val rng = new Random(11L)
    val data = for (i <- 0 until 200) yield {
      val x = math.sin(i * 0.41) * 1.3
      (i.toLong, x, i % 7, rpois(math.exp(0.2 + 0.5 * x), rng))
    }
    val df = data.toDF("rid", "x", "cl", "y")
    val m = Glm.poisson(df, "y", Seq("x"))
    val xArr = data.map(d => Array(d._2)).toArray
    val yArr = data.map(_._4).toArray
    val vRob = Glm.varianceRobust(df, m, "y")
    val vRobD = denseSandwich(xArr, yArr, m.coef, m.gramW, "poisson",
      data.indices.toArray) // singleton clusters = HC0
    val vCl = Glm.varianceRobust(df, m, "y", Some("cl"))
    val vClD = denseSandwich(xArr, yArr, m.coef, m.gramW, "poisson",
      data.map(_._3).toArray)
    for (i <- 0 until 2; j <- 0 until 2) {
      assert(math.abs(vRob(i)(j) - vRobD(i)(j)) < 1e-9)
      assert(math.abs(vCl(i)(j) - vClD(i)(j)) < 1e-9)
    }
  }

  test("PPML with one absorbed FE equals Poisson with explicit dummies") {
    val df = panel.toDF("x", "g", "h", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
    val full = Glm.poisson(withDummies, "y", Seq("x", "d1", "d2", "d3"), tol = 1e-12)
    val fe = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12)
    assert(fe.converged && full.converged)
    assert(math.abs(fe.coef(0) - full.coef(1)) < 1e-7)
    assert(math.abs(fe.deviance - full.deviance) < 1e-6)
    assert(fe.n == panel.length)
    assert(fe.droppedSeparated == 0L)
  }

  test("PPML with two absorbed FEs equals Poisson with explicit dummies, robust SE included") {
    val df = panel.toDF("x", "g", "h", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
      .withColumn("e1", when($"h" === "h1", 1.0).otherwise(0.0))
      .withColumn("e2", when($"h" === "h2", 1.0).otherwise(0.0))
    val dums = Seq("x", "d1", "d2", "d3", "e1", "e2")
    val full = Glm.poisson(withDummies, "y", dums, tol = 1e-12)
    val fe = Glm.poissonFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    assert(fe.converged && full.converged)
    assert(math.abs(fe.coef(0) - full.coef(1)) < 1e-6)
    assert(math.abs(fe.deviance - full.deviance) < 1e-5)
    // weighted-FWL: the x-block of the full-design sandwich equals the
    // demeaned-design sandwich (meat on the same score u = y − μ)
    val vFull = Glm.varianceRobust(withDummies, full, "y")
    val seFullX = math.sqrt(vFull(1)(1))
    assert(math.abs(fe.seRobust(0) - seFullX) / seFullX < 1e-4)
  }

  test("PPML separation check drops all-zero FE groups before fitting") {
    val df = panel.toDF("x", "g", "h", "y")
    // plant a group whose outcome is identically zero
    val planted = df.union(
      Seq((0.3, "gZ", "h0", 0.0), (-0.2, "gZ", "h1", 0.0), (0.1, "gZ", "h2", 0.0))
        .toDF("x", "g", "h", "y"))
    val fe = Glm.poissonFE(planted, "y", Seq("x"), Seq("g"), tol = 1e-12)
    val clean = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12)
    assert(fe.droppedSeparated == 3L)
    assert(fe.n == panel.length)
    assert(math.abs(fe.coef(0) - clean.coef(0)) < 1e-10)
  }

  test("Poisson with an exposure offset matches the offset-aware dense IRLS") {
    val rng = new Random(31L)
    val data = for (i <- 0 until 250) yield {
      val x = math.sin(i * 0.53) * 1.1
      val t = 1.0 + (i % 3) // exposure 1..3
      (x, math.log(t), rpois(t * math.exp(0.2 + 0.4 * x), rng))
    }
    val df = data.toDF("x", "ln_t", "y")
    val m = Glm.poisson(df, "y", Seq("x"), offset = Some("ln_t"))
    val (bD, gD, devD, _) = denseIrls(
      data.map(d => Array(d._1)).toArray, data.map(_._3).toArray, "poisson",
      offset = data.map(_._2).toArray)
    assert(m.converged)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(math.abs(m.deviance - devD) < 1e-7)
    // robust sandwich evaluates μ with the offset folded into η
    val vR = Glm.varianceRobust(df, m, "y")
    assert(vR(1)(1) > 0 && vR(1)(1).isFinite)
    // and the offset fit differs from the offset-less one (sanity)
    val m0 = Glm.poisson(df, "y", Seq("x"))
    assert(math.abs(m0.coef(0) - m.coef(0)) > 1e-3)
  }

  test("GLM frequency weights equal the row-expanded fit (coef, SE, deviance, sandwiches)") {
    val rng = new Random(13L)
    val base = for (i <- 0 until 120) yield {
      val x = math.cos(i * 0.83) * 1.4
      (x, rpois(math.exp(0.3 + 0.4 * x), rng), 1L + (i % 3), i % 5)
    }
    val wdf = base.toDF("x", "y", "w", "cl")
    val expanded = base.flatMap { case (x, y, w, cl) => Seq.fill(w.toInt)((x, y, cl)) }
      .toDF("x", "y", "cl")
    val mw = Glm.poisson(wdf, "y", Seq("x"), weight = Some("w"))
    val me = Glm.poisson(expanded, "y", Seq("x"))
    assert(mw.n == me.n)
    mw.coef.zip(me.coef).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(math.abs(mw.deviance - me.deviance) < 1e-8)
    mw.seInformation.zip(me.seInformation).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-10)
    }
    // HC0: each copy is its own singleton cluster
    val vw = Glm.varianceRobust(wdf, mw, "y")
    val ve = Glm.varianceRobust(expanded, me, "y")
    // clustered: copies share their cluster
    val cw = Glm.varianceRobust(wdf, mw, "y", Some("cl"))
    val ce = Glm.varianceRobust(expanded, me, "y", Some("cl"))
    for (i <- 0 until 2; j <- 0 until 2) {
      assert(math.abs(vw(i)(j) - ve(i)(j)) < 1e-10)
      assert(math.abs(cw(i)(j) - ce(i)(j)) < 1e-10)
    }
  }

  test("PPML with a non-constant offset equals Poisson-with-dummies at the same offset") {
    val rng = new Random(47L)
    val rows = for (i <- 0 until 200) yield {
      val g = s"g${i % 4}"
      val x = math.sin(i * 0.71) * 1.2
      // exposure varies WITHIN each FE group (i%4 and (i/4)%2 are
      // independent cycles) — otherwise the FE absorbs the offset
      val t = 1.0 + ((i / 4) % 2)
      val eff = Map("g0" -> 0.0, "g1" -> 0.5, "g2" -> -0.3, "g3" -> 0.7)(g)
      (x, g, math.log(t), rpois(t * math.exp(0.3 * x + eff), rng))
    }
    val df = rows.toDF("x", "g", "ln_t", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
    val full = Glm.poisson(withDummies, "y", Seq("x", "d1", "d2", "d3"),
      tol = 1e-12, offset = Some("ln_t"))
    val fe = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12, offset = Some("ln_t"))
    assert(fe.converged && full.converged)
    assert(math.abs(fe.coef(0) - full.coef(1)) < 1e-7)
    assert(math.abs(fe.deviance - full.deviance) < 1e-6)
    // sanity: dropping the offset moves the coefficient
    val fe0 = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12)
    assert(math.abs(fe0.deviance - fe.deviance) > 1e-3)
  }

  test("GLM two-way CGM: dense three-term check and same-dimension identity") {
    val rng = new Random(59L)
    val data = for (i <- 0 until 180) yield {
      val x = math.sin(i * 0.47) * 1.2
      (x, i % 6, (i / 6) % 5, rpois(math.exp(0.3 + 0.4 * x), rng))
    }
    val df = data.toDF("x", "ca", "cb", "y")
    val m = Glm.poisson(df, "y", Seq("x"))
    val xArr = data.map(d => Array(d._1)).toArray
    val yArr = data.map(_._4).toArray
    val va = denseSandwich(xArr, yArr, m.coef, m.gramW, "poisson", data.map(_._2).toArray)
    val vb = denseSandwich(xArr, yArr, m.coef, m.gramW, "poisson", data.map(_._3).toArray)
    val vab = denseSandwich(xArr, yArr, m.coef, m.gramW, "poisson",
      data.map(d => d._2 * 100 + d._3).toArray)
    val v2 = Glm.varianceClustered2(df, m, "y", "ca", "cb")
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(v2(i)(j) - (va(i)(j) + vb(i)(j) - vab(i)(j))) < 1e-10)
    // V2(a, a) = V(a)
    val vaSpark = Glm.varianceRobust(df, m, "y", Some("ca"))
    val v2aa = Glm.varianceClustered2(df, m, "y", "ca", "ca")
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(v2aa(i)(j) - vaSpark(i)(j)) < 1e-12)
  }

  test("PPML two-way CGM: same-dimension identity on the FE fit") {
    val df = panel.toDF("x", "g", "h", "y")
      .withColumn("ca", (monotonically_increasing_id() % 8).cast("int"))
      .localCheckpoint()
    val fe = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12, keep = Seq("ca"))
    val v1 = fe.varianceClustered("ca")
    val v2 = fe.varianceClustered2("ca", "ca")
    assert(math.abs(v2(0)(0) - v1(0)(0)) < 1e-12)
    // crossing dims give a finite, different answer
    val df2 = df.withColumn("cb", (monotonically_increasing_id() % 5).cast("int"))
      .localCheckpoint()
    val fe2 = Glm.poissonFE(df2, "y", Seq("x"), Seq("g"), tol = 1e-12, keep = Seq("ca", "cb"))
    val vx = fe2.varianceClustered2("ca", "cb")
    assert(vx(0)(0).isFinite && math.abs(vx(0)(0) - v1(0)(0)) > 1e-12)
  }

  /** Independent dense NB2 with the interleaved Cameron–Trivedi moment
    * update — mirrors [[Glm.negBinomial]]'s iteration order exactly so
    * the distributed fit must match it iteration-for-iteration.
    */
  private def denseNegBin(
      xRaw: Array[Array[Double]],
      y: Array[Double],
      tol: Double = 1e-9,
      maxIter: Int = 50,
      alphaInit: Double = 0.0,
      estimate: Boolean = true
  ): (Array[Double], Array[Array[Double]], Double, Double, Int) = {
    val n = y.length
    val x = xRaw.map(r => 1.0 +: r)
    val k = x.head.length
    val ybar = y.sum / n
    def clip(e: Double) = math.max(-30.0, math.min(30.0, e))
    var alpha = alphaInit
    var beta: Array[Double] = null
    var dev = Double.MaxValue
    var g: Array[Array[Double]] = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val eta = Array.tabulate(n) { i =>
        if (beta == null) math.log((y(i) + ybar) / 2.0)
        else (0 until k).map(j => x(i)(j) * beta(j)).sum
      }
      val m = eta.map(e => math.exp(clip(e)))
      val w = m.map(mi => if (alpha == 0.0) mi else mi / (1.0 + alpha * mi))
      val z = Array.tabulate(n)(i => eta(i) + (y(i) - m(i)) / m(i))
      g = Array.ofDim[Double](k, k)
      val c = Array.ofDim[Double](k)
      for (i <- 0 until n; a <- 0 until k) {
        c(a) += w(i) * x(i)(a) * z(i)
        for (b <- 0 until k) g(a)(b) += w(i) * x(i)(a) * x(i)(b)
      }
      val devNow = (0 until n).map { i =>
        if (alpha == 0.0)
          2.0 * ((if (y(i) > 0) y(i) * math.log(y(i) / m(i)) else 0.0) - (y(i) - m(i)))
        else
          2.0 * ((if (y(i) > 0) y(i) * math.log(y(i) / m(i)) else 0.0) -
            (y(i) + 1.0 / alpha) * math.log((1.0 + alpha * y(i)) / (1.0 + alpha * m(i))))
      }.sum
      val alphaNew =
        if (estimate)
          math.max(
            (0 until n).map(i => (y(i) - m(i)) * (y(i) - m(i)) - y(i)).sum /
              (0 until n).map(i => m(i) * m(i)).sum, 0.0)
        else alpha
      val betaNew = LinAlg.solve(g.map(_.clone()), c)
      converged = beta != null &&
        math.abs(devNow - dev) / (math.abs(devNow) + 0.1) < tol &&
        math.abs(alphaNew - alpha) / (alphaNew + 0.1) < tol
      beta = betaNew
      dev = devNow
      alpha = alphaNew
      iter += 1
    }
    (beta, g, dev, alpha, iter)
  }

  // overdispersed counts: mixture heterogeneity v ∈ {0.4, 1.6} doubles
  // the conditional variance relative to Poisson at the same mean
  private lazy val nbData: Seq[(Double, Int, Double)] = {
    val rng = new Random(20260813L)
    for (i <- 0 until 400) yield {
      val x = math.sin(i * 0.61) * 1.2
      val v = if (i % 2 == 0) 0.4 else 1.6
      (x, i % 9, rpois(v * math.exp(0.4 + 0.5 * x), rng))
    }
  }

  // overdispersed PANEL: the nbData mixture on top of two FE dimensions
  private lazy val nbPanel: Seq[(Double, String, String, Double)] = {
    val rng = new Random(20260813L)
    val aEff = Map("g0" -> 0.0, "g1" -> 0.6, "g2" -> -0.4, "g3" -> 0.9)
    val bEff = Map("h0" -> 0.0, "h1" -> -0.5, "h2" -> 0.3)
    for (i <- 0 until 400) yield {
      val g = s"g${i % 4}"
      val h = s"h${(i / 4) % 3}"
      val x = math.sin(i * 0.37) * 1.5
      // mixture indicator decorrelated from BOTH FE cycles (an i % 2
      // pattern is constant within each g group — the FEs would absorb
      // it and the within-group variance would be exactly Poisson)
      val v = if (rng.nextBoolean()) 0.4 else 1.6
      (x, g, h, rpois(v * math.exp(0.4 * x + aEff(g) + bEff(h)), rng))
    }
  }

  test("NB2-FE absorption equals NB2 with explicit dummies (1 and 2 FEs: coef, alpha, robust SE)") {
    val df = nbPanel.toDF("x", "g", "h", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
      .withColumn("e1", when($"h" === "h1", 1.0).otherwise(0.0))
      .withColumn("e2", when($"h" === "h2", 1.0).otherwise(0.0))
    // one FE: coefficient AND the interleaved dispersion agree with the
    // dummy fit's joint (β, α) fixpoint
    val full1 = Glm.negBinomial(withDummies, "y", Seq("x", "d1", "d2", "d3"), tol = 1e-12)
    val fe1 = Glm.negBinomialFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12)
    assert(fe1.converged && full1.converged)
    assert(math.abs(fe1.coef(0) - full1.coef(1)) < 1e-6,
      s"${fe1.coef(0)} vs ${full1.coef(1)}")
    assert(math.abs(fe1.dispersion.get - full1.dispersion.get) < 1e-6,
      s"alpha ${fe1.dispersion.get} vs ${full1.dispersion.get}")
    // two FEs: plus the robust sandwich through the NB2 score
    // (y−μ)/(1+αμ) on the weighted-demeaned design (weighted FWL)
    val dums = Seq("x", "d1", "d2", "d3", "e1", "e2")
    val full2 = Glm.negBinomial(withDummies, "y", dums, tol = 1e-12)
    val fe2 = Glm.negBinomialFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    assert(fe2.converged && full2.converged)
    assert(math.abs(fe2.coef(0) - full2.coef(1)) < 1e-6,
      s"${fe2.coef(0)} vs ${full2.coef(1)}")
    assert(math.abs(fe2.dispersion.get - full2.dispersion.get) < 1e-6,
      s"alpha ${fe2.dispersion.get} vs ${full2.dispersion.get}")
    // the planted mixture IS overdispersed — α must detect it
    assert(fe2.dispersion.get > 0.05, fe2.dispersion.get.toString)
    val vFull = Glm.varianceRobust(withDummies, full2, "y")
    val seFullX = math.sqrt(vFull(1)(1))
    assert(math.abs(fe2.seRobust(0) - seFullX) / seFullX < 1e-4,
      s"${fe2.seRobust(0)} vs $seFullX")
  }

  test("NB2-FE with fixed alpha = 0 reproduces poissonFE exactly") {
    val df = nbPanel.toDF("x", "g", "h", "y")
    val pois = Glm.poissonFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    // NegBin(0)'s column expressions degrade to Poisson's — same
    // iteration count, same coefficients to machine precision
    val fixed = Glm.negBinomialFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12,
      alphaInit = 0.0, estimateAlpha = false)
    assert(fixed.converged && fixed.iters == pois.iters)
    assert(math.abs(fixed.coef(0) - pois.coef(0)) < 1e-12)
    assert(math.abs(fixed.deviance - pois.deviance) < 1e-9)
    assert(math.abs(fixed.seRobust(0) - pois.seRobust(0)) < 1e-12)
    assert(fixed.dispersion == Some(0.0))
  }

  test("NB2 matches the independent dense IRLS with interleaved dispersion (coef, SE, dev, alpha)") {
    val df = nbData.toDF("x", "cl", "y")
    val m = Glm.negBinomial(df, "y", Seq("x"))
    val (bD, gD, devD, aD, itD) = denseNegBin(
      nbData.map(d => Array(d._1)).toArray, nbData.map(_._3).toArray)
    assert(m.converged && m.iters == itD)
    assert(m.dispersion.isDefined)
    assert(math.abs(m.dispersion.get - aD) < 1e-9, s"${m.dispersion.get} vs $aD")
    // the planted mixture IS overdispersed — α must come out positive
    assert(m.dispersion.get > 0.05, m.dispersion.get.toString)
    m.coef.zip(bD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    assert(math.abs(m.deviance - devD) / math.abs(devD) < 1e-9)
    val seD = LinAlg.inverse(gD).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
    m.seInformation.zip(seD).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // NB2 information SEs exceed the (variance-understating) Poisson ones
    val mp = Glm.poisson(df, "y", Seq("x"))
    assert(m.seInformation(1) > mp.seInformation(1))
  }

  test("NB2 with fixed alpha = 0 reproduces the Poisson fit; equidispersed data drives alpha ~ 0") {
    val rng = new Random(7L)
    val data = for (i <- 0 until 300) yield {
      val x = math.sin(i * 0.61) * 1.2
      (x, rpois(math.exp(0.5 + 0.3 * x), rng))
    }
    val df = data.toDF("x", "y")
    val pois = Glm.poisson(df, "y", Seq("x"))
    // α pinned at 0: the NB2 expressions degrade to Poisson's exactly
    val fixed = Glm.negBinomial(df, "y", Seq("x"), alphaInit = 0.0, estimateAlpha = false)
    assert(fixed.converged && fixed.iters == pois.iters)
    fixed.coef.zip(pois.coef).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    assert(math.abs(fixed.deviance - pois.deviance) < 1e-9)
    // estimated: Poisson-generated counts give a near-zero moment α and
    // coefficients indistinguishable from the Poisson fit
    val est = Glm.negBinomial(df, "y", Seq("x"))
    assert(est.converged && est.dispersion.get < 0.1, est.dispersion.get.toString)
    est.coef.zip(pois.coef).foreach { case (a, b) => assert(math.abs(a - b) < 5e-3) }
    // cross-model SE pin (moved from q90, which now runs ONE fit): the
    // NB2 information SE can never fall below Poisson's by more than
    // numerical noise — α ≥ 0 only widens the variance
    assert(est.seInformation(1) >= pois.seInformation(1) * (1.0 - 1e-6),
      s"NB2 SE ${est.seInformation(1)} fell below Poisson ${pois.seInformation(1)}")
  }

  test("NB2 robust and clustered sandwiches use the (y-mu)/(1+alpha*mu) score") {
    val df = nbData.toDF("x", "cl", "y")
    val m = Glm.negBinomial(df, "y", Seq("x"))
    val a = m.dispersion.get
    // dense sandwich with the NB2 score residual at the fitted β
    def dense(clusters: Array[Int]): Array[Array[Double]] = {
      val x = nbData.map(d => Array(1.0, d._1)).toArray
      val k = 2
      val scores = scala.collection.mutable.Map[Int, Array[Double]]()
      for (i <- nbData.indices) {
        val eta = (0 until k).map(j => x(i)(j) * m.coef(j)).sum
        val mu = math.exp(math.max(-30.0, math.min(30.0, eta)))
        val u = (nbData(i)._3 - mu) / (1.0 + a * mu)
        val s = scores.getOrElseUpdate(clusters(i), Array.ofDim[Double](k))
        for (q <- 0 until k) s(q) += u * x(i)(q)
      }
      val meat = Array.ofDim[Double](k, k)
      for (s <- scores.values; p <- 0 until k; q <- 0 until k) meat(p)(q) += s(p) * s(q)
      val inv = LinAlg.inverse(m.gramW)
      LinAlg.matMul(LinAlg.matMul(inv, meat), inv)
    }
    val vR = Glm.varianceRobust(df, m, "y")
    val vRd = dense(nbData.indices.toArray)
    val vC = Glm.varianceRobust(df, m, "y", Some("cl"))
    val vCd = dense(nbData.map(_._2).toArray)
    for (i <- 0 until 2; j <- 0 until 2) {
      assert(math.abs(vR(i)(j) - vRd(i)(j)) / math.abs(vRd(i)(j)) < 1e-8)
      assert(math.abs(vC(i)(j) - vCd(i)(j)) / math.abs(vCd(i)(j)) < 1e-8)
    }
  }

  // strictly-positive panel for the FE-Gamma parity: y = exp(0.4x + a_g + ε)
  private lazy val gammaPanel: Seq[(Double, String, String, Double)] =
    for (i <- 0 until 240) yield {
      val g = s"g${i % 4}"
      val h = s"h${(i / 4) % 3}"
      val aEff = Map("g0" -> 0.0, "g1" -> 0.6, "g2" -> -0.4, "g3" -> 0.9)(g)
      val bEff = Map("h0" -> 0.0, "h1" -> -0.5, "h2" -> 0.3)(h)
      val x = math.sin(i * 0.37) * 1.5
      val eps = 0.3 * math.sin(i * 1.9 + 0.7)
      (x, g, h, math.exp(0.4 * x + aEff + bEff + eps))
    }

  test("FE-Gamma equals gamma-log with explicit dummies (coef, deviance, robust SE)") {
    val df = gammaPanel.toDF("x", "g", "h", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
    val full = Glm.gamma(withDummies, "y", Seq("x", "d1", "d2", "d3"), tol = 1e-12)
    val fe = Glm.gammaFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12)
    assert(fe.converged && full.converged)
    assert(math.abs(fe.coef(0) - full.coef(1)) < 1e-7, s"${fe.coef(0)} vs ${full.coef(1)}")
    assert(math.abs(fe.deviance - full.deviance) < 1e-6)
    assert(fe.droppedSeparated == 0L)
    // weighted-FWL: x-block of the full-design gamma sandwich
    val vFull = Glm.varianceRobust(withDummies, full, "y")
    val seFullX = math.sqrt(vFull(1)(1))
    assert(math.abs(fe.seRobust(0) - seFullX) / seFullX < 1e-4)
  }

  test("FE-Gamma with two absorbed FEs equals the dummy-expanded fit") {
    val df = gammaPanel.toDF("x", "g", "h", "y")
    val withDummies = df
      .withColumn("d1", when($"g" === "g1", 1.0).otherwise(0.0))
      .withColumn("d2", when($"g" === "g2", 1.0).otherwise(0.0))
      .withColumn("d3", when($"g" === "g3", 1.0).otherwise(0.0))
      .withColumn("e1", when($"h" === "h1", 1.0).otherwise(0.0))
      .withColumn("e2", when($"h" === "h2", 1.0).otherwise(0.0))
    val full = Glm.gamma(withDummies, "y", Seq("x", "d1", "d2", "d3", "e1", "e2"), tol = 1e-12)
    val fe = Glm.gammaFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    assert(fe.converged && full.converged)
    assert(math.abs(fe.coef(0) - full.coef(1)) < 1e-6)
    assert(math.abs(fe.deviance - full.deviance) < 1e-5)
    // Gamma rejects non-positive outcomes up front
    val bad = df.withColumn("y", when($"g" === "g1", 0.0).otherwise($"y"))
    val err = intercept[IllegalArgumentException](Glm.gammaFE(bad, "y", Seq("x"), Seq("g")))
    assert(err.getMessage.contains("y > 0"), err.getMessage)
  }

  test("gaussianFE equals the linear FE estimator (identity-link anchor)") {
    val df = panel.toDF("x", "g", "h", "y")
    val fe = Glm.gaussianFE(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    val lin = FixedEffects.fit(df, "y", Seq("x"), Seq("g", "h"), tol = 1e-12)
    assert(fe.converged)
    assert(math.abs(fe.coef(0) - lin.coef(0)) < 1e-9, s"${fe.coef(0)} vs ${lin.coef(0)}")
    // deviance of the gaussian family is the SSR of the within fit
    assert(math.abs(fe.deviance - lin.ols.ssr) < 1e-6)
  }

  test("PPML clustered SE matches the dense cluster sandwich via dummies") {
    val df = panel.toDF("x", "g", "h", "y")
      .withColumn("cl", (monotonically_increasing_id() % 10).cast("int"))
      .localCheckpoint()
    val fe = Glm.poissonFE(df, "y", Seq("x"), Seq("g"), tol = 1e-12, keep = Seq("cl"))
    // dense: dummy-expanded design, cluster meat, x-block
    val rows = df.select("x", "g", "y", "cl").collect()
    val xArr = rows.map { r =>
      val g = r.getString(1)
      Array(r.getDouble(0),
        if (g == "g1") 1.0 else 0.0, if (g == "g2") 1.0 else 0.0, if (g == "g3") 1.0 else 0.0)
    }
    val yArr = rows.map(_.getDouble(2))
    val clArr = rows.map(_.getInt(3))
    val (bD, gD, _, _) = denseIrls(xArr, yArr, "poisson", tol = 1e-12)
    val vD = denseSandwich(xArr, yArr, bD, gD, "poisson", clArr)
    val seDx = math.sqrt(vD(1)(1))
    assert(math.abs(fe.seClustered("cl")(0) - seDx) / seDx < 1e-4)
  }

  test("averageMarginalEffects matches a numerical probability derivative (logit)") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 4000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextDouble()
      val p = 1.0 / (1.0 + math.exp(-(-0.5 + 1.2 * x1 - 0.8 * x2)))
      (if (rng.nextDouble() < p) 1 else 0, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val m = Glm.logistic(df, "y", Seq("x1", "x2"))
    val ame = Glm.averageMarginalEffects(df, m).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // numerical AME: mean over rows of [P(.|x_j+h) - P(.|x_j-h)]/2h at
    // the FITTED coefficients
    val b = m.coef // (intercept, x1, x2)
    def pOf(x1: Double, x2: Double) =
      1.0 / (1.0 + math.exp(-(b(0) + b(1) * x1 + b(2) * x2)))
    val h = 1e-5
    val num1 = rows.map { case (_, x1, x2) => (pOf(x1 + h, x2) - pOf(x1 - h, x2)) / (2 * h) }
      .sum / rows.size
    val num2 = rows.map { case (_, x1, x2) => (pOf(x1, x2 + h) - pOf(x1, x2 - h)) / (2 * h) }
      .sum / rows.size
    assert(math.abs(ame("x1") - num1) < 1e-4, s"${ame("x1")} vs $num1")
    assert(math.abs(ame("x2") - num2) < 1e-4, s"${ame("x2")} vs $num2")
    // sign and magnitude sanity: AME is the coefficient shrunk by E[mu(1-mu)] <= 0.25
    assert(ame("x1") > 0 && ame("x1") < b(1))
  }
}
