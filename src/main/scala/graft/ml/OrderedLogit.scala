package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered logit (proportional odds, McCullagh 1980) — ordinal
  * outcomes: J ranked levels (ratings, Likert rubric scores, severity
  * grades) with P(y ≤ j) = σ(α_j − x'β), one slope vector shared
  * across thresholds. THE model for "grade this 1–5" eval data, where
  * treating levels as numeric fakes intervals and one-vs-rest logits
  * throw away the ordering.
  *
  * Newton–Raphson on the full (α, β) log-likelihood — CONCAVE for the
  * logit link (Pratt 1981), so Newton from the quantile init converges
  * to the global MLE. Per row only the two bracketing thresholds
  * couple, so the gradient and Hessian reduce to (J + k)²-bounded
  * conditional aggregates: ONE distributed moment pass per iteration
  * over a checkpointed projection, then a (J−1+k)×(J−1+k) driver
  * solve — the [[Glm]]/[[Tobit]] scale shape. Levels are collected
  * (driver-bounded, require ≤ 50) and indexed in sorted order.
  */
object OrderedLogit {

  case class Model(
      levels: Seq[String],
      cutpoints: Array[Double], // α_1 < … < α_{J−1}
      xNames: Seq[String],
      beta: Array[Double],
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
    require(k >= 1, "OrderedLogit.fit needs at least one covariate")
    val levels = df.select(col(yCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val bigJ = levels.length
    require(bigJ >= 2, s"OrderedLogit.fit needs >= 2 outcome levels, got $bigJ")
    require(bigJ <= 50, s"OrderedLogit.fit: $bigJ levels — ordinal outcomes are scales, not ids")

    val lvlIdx = levels.zipWithIndex.map { case (v, i) => (v, i + 1) } // 1..J
    val jCol = lvlIdx.foldLeft(lit(0)) { case (acc, (v, i)) =>
      when(col(yCol).cast("string") === v, lit(i)).otherwise(acc)
    }
    val base = df.select(
      (jCol.as("__j") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"__x$i") }): _*)
      .localCheckpoint(true)
    val n = base.count()

    // quantile init: α_j = logit(cumulative share ≤ level j), β = 0
    val shares = base.groupBy("__j").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var cum = 0L
    val alpha0 = (1 until bigJ).map { j =>
      cum += shares.getOrElse(j, 0L)
      val p = math.min(1.0 - 1e-6, math.max(1e-6, cum.toDouble / n))
      math.log(p / (1.0 - p))
    }.toArray

    val p = bigJ - 1 + k // parameter count: cutpoints then betas
    var theta: Array[Double] = alpha0 ++ Array.fill(k)(0.0)
    def xc(r: Int): Column = col(s"__x$r")
    val bPairs = for { a <- 0 until k; b <- a until k } yield (a, b)

    var ll = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val eta = (0 until k).map(r => xc(r) * theta(bigJ - 1 + r)).reduce(_ + _)
      def sig(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))
      // u = α_j − η (σ→1, f→0 at j = J); l = α_{j−1} − η (σ→0 at j = 1)
      val alphaAt = (j: Column, shift: Int) =>
        (1 until bigJ).foldLeft(lit(0.0)) { (acc, m) =>
          when(j === m + shift, lit(theta(m - 1))).otherwise(acc)
        }
      val u = alphaAt(col("__j"), 0) - eta
      val l = alphaAt(col("__j"), 1) - eta
      val atTop = col("__j") === bigJ
      val atBottom = col("__j") === 1
      val sU = when(atTop, lit(1.0)).otherwise(sig(u))
      val sL = when(atBottom, lit(0.0)).otherwise(sig(l))
      val fU = when(atTop, lit(0.0)).otherwise(sU * (lit(1.0) - sU))
      val fL = when(atBottom, lit(0.0)).otherwise(sL * (lit(1.0) - sL))
      val fpU = fU * (lit(1.0) - lit(2.0) * sU)
      val fpL = fL * (lit(1.0) - lit(2.0) * sL)
      val prob = greatest(sU - sL, lit(1e-300))
      val d2u = fpU / prob - fU * fU / (prob * prob)
      val d2l = -fpL / prob - fL * fL / (prob * prob)
      val dul = fU * fL / (prob * prob)
      val gU = fU / prob
      val gL = fL / prob
      def isJ(m: Int): Column = (col("__j") === m).cast("double")

      val aggs: Seq[Column] =
        sum(log(prob)).as("ll") +:
          (((1 until bigJ).map(m => sum(isJ(m) * gU - isJ(m + 1) * gL)) ++ // g_α
            (0 until k).map(r => sum(-(gU - gL) * xc(r))) ++ // g_β
            (1 until bigJ).map(m => sum(isJ(m) * d2u + isJ(m + 1) * d2l)) ++ // H_αmαm
            (1 until bigJ - 1).map(m => sum(isJ(m + 1) * dul)) ++ // H_αm,αm+1
            (for { m <- 1 until bigJ; r <- 0 until k } yield
              sum((isJ(m) * (d2u + dul) + isJ(m + 1) * (d2l + dul)) * -xc(r))) ++ // H_αβ
            bPairs.map { case (a, b) =>
              sum((d2u + lit(2.0) * dul + d2l) * xc(a) * xc(b)) // H_ββ
            }))
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val llNow = row.getDouble(0)
      var idx = 1
      val g = Array.ofDim[Double](p)
      (0 until p).foreach { i => g(i) = row.getDouble(idx); idx += 1 }
      val h = Array.ofDim[Double](p, p)
      (0 until bigJ - 1).foreach { m => h(m)(m) = row.getDouble(idx); idx += 1 }
      (0 until bigJ - 2).foreach { m =>
        val v = row.getDouble(idx); idx += 1
        h(m)(m + 1) = v; h(m + 1)(m) = v
      }
      for { m <- 0 until bigJ - 1; r <- 0 until k } {
        val v = row.getDouble(idx); idx += 1
        h(m)(bigJ - 1 + r) = v; h(bigJ - 1 + r)(m) = v
      }
      bPairs.foreach { case (a, b) =>
        val v = row.getDouble(idx); idx += 1
        h(bigJ - 1 + a)(bigJ - 1 + b) = v; h(bigJ - 1 + b)(bigJ - 1 + a) = v
      }
      val step = LinAlg.solve(h.map(_.map(-_)), g)
      theta = theta.zip(step).map { case (t, s) => t + s }
      converged = step.map(math.abs).max < tol &&
        (llNow - ll).abs < 1e-10 * (1 + llNow.abs)
      ll = llNow
      iter += 1
    }
    Model(levels, theta.take(bigJ - 1), xCols, theta.drop(bigJ - 1), ll, iter, converged, n)
  }

  /** Summary frame: one row per cutpoint and per covariate (6dp). */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val rows =
      m.cutpoints.zipWithIndex.toSeq.map { case (a, i) =>
        ("cutpoint", s"${m.levels(i)}|${m.levels(i + 1)}", q6(a))
      } ++
        m.xNames.zip(m.beta).map { case (nm, b) => ("coef", nm, q6(b)) }
    rows.toDF("kind", "name", "value")
      .withColumn("n", lit(m.n))
      .withColumn("iters", lit(m.iters))
      .withColumn("converged", lit(if (m.converged) 1 else 0))
  }
}
