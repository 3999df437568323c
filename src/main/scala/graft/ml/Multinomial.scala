package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial (softmax) logit — UNORDERED categorical outcomes,
  * completing the discrete-choice family beside [[Glm.logistic]]
  * (binary), [[Glm.probit]] (binary latent-normal) and
  * [[OrderedLogit]] (ordinal): J classes, reference = the LAST sorted
  * level, η_c = x̃'θ_c and P(y = c) = e^{η_c}/(1 + Σ_m e^{η_m}).
  *
  * Newton–Raphson on the (strictly concave) multinomial
  * log-likelihood: gradient blocks Σ(1{y=c} − P_c)·x̃ and Hessian
  * blocks −Σ P_c(δ_cd − P_d)·x̃x̃' are ((J−1)(k+1))²-bounded moment
  * aggregates — ONE distributed pass per iteration over a checkpointed
  * projection, then a driver block solve (the [[Glm]]/[[Tobit]]/
  * [[OrderedLogit]] scale shape). η's are clamped at ±30 inside a
  * max-shifted softmax for overflow safety. Levels are collected
  * (driver-bounded, require ≤ 12 — nominal choice sets, not ids).
  */
object Multinomial {

  case class Model(
      levels: Seq[String], // sorted; last = reference class
      xNames: Seq[String], // intercept first
      coef: Array[Array[Double]], // (J−1) rows × (k+1) params
      loglik: Double,
      iters: Int,
      converged: Boolean,
      n: Long)

  def fit(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      maxIter: Int = 50,
      tol: Double = 1e-9): Model = {
    val k = xCols.size
    val kt = k + 1 // intercept first
    val levels = df.select(col(yCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val bigJ = levels.length
    require(bigJ >= 2, s"Multinomial.fit needs >= 2 classes, got $bigJ")
    require(bigJ <= 12, s"Multinomial.fit: $bigJ classes — choice sets, not ids")
    val nc = bigJ - 1 // non-reference classes

    val jCol = levels.zipWithIndex.foldLeft(lit(0)) { case (acc, (v, i)) =>
      when(col(yCol).cast("string") === v, lit(i + 1)).otherwise(acc)
    }
    val base = df.select(
      (jCol.as("__j") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__x$i") }): _*)
      .localCheckpoint(true)
    val n = base.count()

    def xc(r: Int): Column = if (r == 0) lit(1.0) else col(s"__x${r - 1}")

    var theta: Array[Array[Double]] = Array.fill(nc)(Array.fill(kt)(0.0))
    val p = nc * kt
    // Hessian upper-triangle index pairs over the flattened parameter
    val flatPairs = for { a <- 0 until p; b <- a until p } yield (a, b)

    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val etas: Seq[Column] = (0 until nc).map { c =>
        least(greatest(
          (0 until kt).map(r => xc(r) * theta(c)(r)).reduce(_ + _),
          lit(-30.0)), lit(30.0))
      }
      // max-shifted softmax (reference class contributes η_ref = 0)
      val mx = etas.foldLeft(lit(0.0))((acc, e) => greatest(acc, e))
      val exps = etas.map(e => exp(e - mx))
      val denom = exp(-mx) + exps.reduce(_ + _)
      val probs = exps.map(_ / denom)
      val llRow = {
        // ln P_y: for class c, η_c − mx − ln(denom); reference: −mx − ln(denom)
        val lden = log(denom)
        (1 to bigJ).map { j =>
          val t = if (j <= nc) etas(j - 1) - mx - lden else -mx - lden
          when(col("__j") === j, t).otherwise(lit(0.0))
        }.reduce(_ + _)
      }
      def flat(c: Int, r: Int): Int = c * kt + r
      val gradCols = for { c <- 0 until nc; r <- 0 until kt } yield
        sum(((col("__j") === (c + 1)).cast("double") - probs(c)) * xc(r))
      val hessCols = flatPairs.map { case (a, b) =>
        val (ca, ra) = (a / kt, a % kt)
        val (cb, rb) = (b / kt, b % kt)
        val w =
          if (ca == cb) probs(ca) * (lit(1.0) - probs(cb))
          else -probs(ca) * probs(cb)
        sum(w * xc(ra) * xc(rb))
      }
      val aggs = sum(llRow).as("ll") +: (gradCols ++ hessCols)
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val llNow = row.getDouble(0)
      val g = Array.tabulate(p)(i => row.getDouble(1 + i))
      val h = Array.ofDim[Double](p, p) // this IS −Hessian (positive semidefinite)
      flatPairs.zipWithIndex.foreach { case ((a, b), i) =>
        val v = row.getDouble(1 + p + i); h(a)(b) = v; h(b)(a) = v
      }
      val step = LinAlg.solve(h, g)
      theta = Array.tabulate(nc)(c =>
        Array.tabulate(kt)(r => theta(c)(r) + step(flat(c, r))))
      converged = step.map(math.abs).max < tol &&
        (llNow - ll).abs < 1e-10 * (1 + llNow.abs)
      ll = llNow
      iter += 1
    }
    Model(levels, "(intercept)" +: xCols, theta, ll, iter, converged, n)
  }

  /** Summary frame: one row per (class, param), reference class
    * excluded (its coefficients are 0 by construction), 6dp.
    */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val ref = m.levels.last
    val rows = for {
      c <- m.coef.indices
      r <- m.xNames.indices
    } yield (m.levels(c), m.xNames(r), q6(m.coef(c)(r)))
    rows.toDF("class", "name", "coef")
      .withColumn("reference", lit(ref))
      .withColumn("n", lit(m.n))
      .withColumn("iters", lit(m.iters))
      .withColumn("converged", lit(if (m.converged) 1 else 0))
  }
}
