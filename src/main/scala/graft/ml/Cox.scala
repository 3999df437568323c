package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cox proportional-hazards regression with Breslow tie handling — the
  * semiparametric time-to-event workhorse beside the nonparametric
  * Kaplan–Meier curve ([[Survival.kaplanMeier]]) and the parametric
  * discrete-time cloglog GLM ([[Glm]]): hazard ratios exp(β) without
  * modeling the baseline hazard at all (Cox 1972; Breslow 1974 for the
  * tie approximation).
  *
  * Newton–Raphson on the partial log-likelihood. The gradient and
  * Hessian need, at every EVENT time, the risk-set sums S0 = Σ_{t_j ≥ t}
  * w_j, S1 = Σ x w, S2 = Σ xx' w with w = exp(xβ). Those are SUFFIX
  * sums in event-time order, so one RANGE window over t DESC (equal
  * times pooled — exactly Breslow's convention) computes all
  * 1 + k + k(k+1)/2 of them in a single pass; an events-only aggregate
  * then reduces gradient, Hessian, and log-likelihood, and the driver
  * solves the k×k Newton step. Per iteration: one window pass + one
  * aggregate — the frame is subject-level (one row per unit, like KM),
  * never event-log-sized, so the global-order window is the same
  * deliberate cost as [[graft.ops.Stats.rfm]]'s ntiles.
  */
object Cox {

  case class Model(
      beta: Array[Double],
      hazardRatios: Array[Double],
      loglik: Double,
      iters: Int,
      n: Long,
      nEvents: Long)

  def fit(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      xCols: Seq[String],
      maxIter: Int = 25,
      tol: Double = 1e-9): Model = {
    val k = xCols.size
    require(k >= 1, "Cox.fit needs at least one covariate")
    val base = df.select(
      (col(durationCol).cast("double").as("t") +:
        col(eventCol).cast("int").as("ev") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"x$i") }): _*)
      .localCheckpoint(true)

    val nRow = base.agg(count(lit(1)), sum(col("ev").cast("long"))).head()
    val n = nRow.getLong(0); val nEvents = nRow.getLong(1)
    require(nEvents > 0, "Cox.fit: no events (all rows censored)")

    // risk set = everyone with t_j >= t_i: suffix RANGE window; equal
    // durations pool into the same risk set (Breslow)
    val w = Window.orderBy(col("t").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val pairs = for { p <- 0 until k; q <- p until k } yield (p, q)

    var beta = Array.fill(k)(0.0)
    var loglik = Double.NegativeInfinity
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val eta = (0 until k).map(p => lit(beta(p)) * col(s"x$p")).reduce(_ + _)
      val scored = base.withColumn("eta", eta).withColumn("wgt", exp(col("eta")))
      val cum = scored
        .withColumn("s0", sum(col("wgt")).over(w))
        .withColumns(
          (0 until k).map(p => s"s1_$p" -> sum(col(s"x$p") * col("wgt")).over(w)).toMap)
        .withColumns(
          pairs.map { case (p, q) =>
            s"s2_${p}_$q" -> sum(col(s"x$p") * col(s"x$q") * col("wgt")).over(w)
          }.toMap)
      val aggCols =
        sum(col("eta") - log(col("s0"))).as("ll") +:
          (0 until k).map(p =>
            sum(col(s"x$p") - col(s"s1_$p") / col("s0")).as(s"g$p")) ++:
          pairs.map { case (p, q) =>
            sum(col(s"s2_${p}_$q") / col("s0") -
              (col(s"s1_$p") / col("s0")) * (col(s"s1_$q") / col("s0"))).as(s"h${p}_$q")
          }
      val r = cum.where(col("ev") === 1).agg(aggCols.head, aggCols.tail: _*).head()
      val ll = r.getDouble(0)
      val g = (0 until k).map(p => r.getDouble(1 + p)).toArray
      val h = Array.ofDim[Double](k, k)
      pairs.zipWithIndex.foreach { case ((p, q), i) =>
        val v = r.getDouble(1 + k + i); h(p)(q) = v; h(q)(p) = v
      }
      val delta = LinAlg.solve(h, g)
      beta = beta.zip(delta).map { case (b, d) => b + d }
      done = delta.map(math.abs).max < tol && (ll - loglik).abs < 1e-12 * (1 + ll.abs)
      loglik = ll
      iter += 1
    }
    Model(beta, beta.map(math.exp), loglik, iter, n, nEvents)
  }

  /** Per-covariate summary frame for a fitted model: coef, hazard ratio.
    * 6dp via the portable floor-quantizer (chain-produced floats).
    */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model, names: Seq[String]): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    names.zipWithIndex.map { case (nm, i) => (nm, q6(m.beta(i)), q6(m.hazardRatios(i))) }
      .toDF("covariate", "coef", "hazard_ratio")
      .withColumn("n", lit(m.n))
      .withColumn("n_events", lit(m.nEvents))
      .withColumn("iters", lit(m.iters))
  }
}
