package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zero-inflated Poisson (Lambert 1992) — count outcomes whose zeros
  * come from TWO processes: a structural never-class (probability π)
  * and ordinary Poisson zeros. The classic fix when [[Glm.poisson]]
  * under-predicts zeros and [[Glm.negBinomial]]'s overdispersion story
  * is wrong (excess zeros, not fat tails): engagement counts with a
  * dormant-user mass, defect counts with defect-free lots.
  *
  * Generalized EM with a constant inflation rate π and log-link
  * Poisson mean λ = e^{x'β}: the E-step computes each zero row's
  * structural-responsibility w = π/(π + (1−π)e^{−λ}); the M-step
  * updates π = Σw/n exactly and takes ONE weighted IRLS step for β
  * with prior weights (1−w) (a GEM step — each sweep still ascends
  * the likelihood). Fixed sweep budget + relative-ll stop. Every
  * sweep is ONE distributed moment aggregate over a checkpointed
  * projection + a (k+1)-dim driver solve — the [[Glm]]/[[Tobit]]
  * scale shape. ll omits the ln y! constant (fit-invariant).
  */
object Zip {

  case class Model(
      xNames: Seq[String], // intercept first
      beta: Array[Double],
      pi: Double,
      loglik: Double,
      iters: Int,
      converged: Boolean,
      n: Long,
      nZero: Long)

  def fit(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      maxIter: Int = 40,
      tol: Double = 1e-8): Model = {
    val k = xCols.size + 1
    val names = "(intercept)" +: xCols
    val base = df.select(
      (col(yCol).cast("double").as("__y") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__x$i") }): _*)
      .withColumn("__z0", (col("__y") === 0.0).cast("double"))
      .localCheckpoint(true)
    val cnt = base.agg(count(lit(1)), sum(col("__z0"))).head()
    val n = cnt.getLong(0); val nZero = cnt.getDouble(1).toLong
    require(n > 0, "Zip.fit: empty input")
    require(nZero < n,
      "Zip.fit: all outcomes are zero — the positive-count Poisson component " +
        "is unidentified (no positive mean to initialize from)")

    def xc(j: Int): Column = if (j == 0) lit(1.0) else col(s"__x${j - 1}")
    val pairs = for { a <- 0 until k; b <- a until k } yield (a, b)

    // init: Poisson-ish intercept from the positive mean, slopes 0,
    // π from the zero share (clamped inside (0,1))
    val posMean = base.where(col("__y") > 0).agg(avg(col("__y"))).head().getDouble(0)
    var beta: Array[Double] = math.log(math.max(posMean, 1e-6)) +: Array.fill(k - 1)(0.0)
    var pi = math.min(0.95, math.max(0.05, nZero.toDouble / n))

    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val eta = least(greatest(
        (0 until k).map(j => xc(j) * beta(j)).reduce(_ + _), lit(-30.0)), lit(30.0))
      val lam = exp(eta)
      val p0 = lit(pi) + lit(1.0 - pi) * exp(-lam)
      // E-step responsibility (zero rows only), arithmetic-blended
      val w = col("__z0") * (lit(pi) / p0)
      val pw = lit(1.0) - w // Poisson prior weight
      // ll (ln y! dropped): zero rows ln p0; positive ln(1−π) + yη − λ
      val llTerm = col("__z0") * log(p0) +
        (lit(1.0) - col("__z0")) * (lit(math.log(1.0 - pi)) +
          col("__y") * eta - lam)
      // one IRLS step: W = pw·λ, z = η + (y − λ)/λ → Wz = pw·(λη + y − λ)
      val irW = pw * lam
      val irWz = pw * (lam * eta + col("__y") - lam)
      val work = base.select(
        (Seq(llTerm.as("__ll"), w.as("__w"), irW.as("__iw"), irWz.as("__iwz")) ++
          (0 until k - 1).map(i => col(s"__x$i"))): _*)
      val aggs: Seq[Column] =
        sum(col("__ll")).as("ll") +: sum(col("__w")).as("sw") +:
          (pairs.map { case (a, b) => sum(col("__iw") * xc(a) * xc(b)) } ++
            (0 until k).map(j => sum(col("__iwz") * xc(j))))
      val r = work.agg(aggs.head, aggs.tail: _*).head()
      val llNow = r.getDouble(0)
      val sw = r.getDouble(1)
      val g = Array.ofDim[Double](k, k)
      pairs.zipWithIndex.foreach { case ((a, b), i) =>
        val v = r.getDouble(2 + i); g(a)(b) = v; g(b)(a) = v
      }
      val c = Array.tabulate(k)(j => r.getDouble(2 + pairs.size + j))
      beta = LinAlg.solve(g, c)
      pi = math.min(1.0 - 1e-12, math.max(1e-12, sw / n))
      converged = iter > 0 && (llNow - ll).abs < tol * (1 + llNow.abs)
      ll = llNow
      iter += 1
    }
    Model(names, beta, pi, ll, iter, converged, n, nZero)
  }

  /** Summary frame: per-coefficient rows plus π and the zero census. */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    m.xNames.zip(m.beta).map { case (nm, b) => (nm, q6(b)) }
      .toDF("name", "coef")
      .withColumn("pi", lit(q6(m.pi)))
      .withColumn("n", lit(m.n))
      .withColumn("n_zero", lit(m.nZero))
      .withColumn("iters", lit(m.iters))
      .withColumn("converged", lit(if (m.converged) 1 else 0))
  }
}
