package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
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
  * w_j, S1 = Σ x w, S2 = Σ xx' w with w = exp(xβ). Equal times pool
  * into the same risk set (exactly Breslow's convention), so the
  * subject frame first COLLAPSES to one row per distinct duration
  * (per-t sums of w, xw, xx'w plus the event-side sums Σeta, Σx, d) and
  * the suffix sums ride ONE distributed prefix pass over that frame
  * ([[graft.ops.Rank.withPrefixSums]]: range exchange + per-partition
  * windows + P-row carry — never the single-partition WindowExec a
  * global t-DESC window would be, even when durations are continuous
  * and distinct t ≈ n). A duration-frame aggregate then reduces
  * gradient, Hessian, and log-likelihood (events at the same t share
  * their S values, so Σ_events f(S(tᵢ)) = Σ_t dₜ·f(Sₜ) exactly), and
  * the driver solves the k×k Newton step. Per iteration: one groupBy,
  * one distributed scan, one aggregate.
  */
object Cox {

  /** One Newton iteration's distinct-duration frame at the given β:
    * per-t risk-side sums (w0, w1_p, w2_pq), event-side sums (dt,
    * ev_eta, ex_p), and their distributed cumulative/total columns
    * (`__cum_*` / `__tot_*` from [[graft.ops.Rank.withPrefixSums]]) —
    * suffix risk sets read as `__tot − __cum + value`. Exposed
    * package-private so the spec can assert the executed plan has no
    * unpartitioned WindowExec.
    */
  private[ml] def iterationFrame(
      base: DataFrame,
      beta: Array[Double],
      k: Int,
      pairs: Seq[(Int, Int)]): DataFrame = {
    val eta = (0 until k).map(p => lit(beta(p)) * col(s"x$p")).reduce(_ + _)
    val scored = base.withColumn("eta", eta).withColumn("wgt", exp(col("eta")))
    // collapse to the distinct-duration frame: risk-side sums (w, xw,
    // xx'w) and event-side sums (d, Σeta, Σx over ev=1) per t
    val perT = scored
      .groupBy("t")
      .agg(
        sum(col("wgt")).as("w0"),
        ((0 until k).map(p => sum(col(s"x$p") * col("wgt")).as(s"w1_$p")) ++
          pairs.map { case (p, q) =>
            sum(col(s"x$p") * col(s"x$q") * col("wgt")).as(s"w2_${p}_$q")
          } ++
          Seq(
            sum(col("ev").cast("long")).as("dt"),
            sum(when(col("ev") === 1, col("eta")).otherwise(lit(0.0))).as("ev_eta")) ++
          (0 until k).map(p =>
            sum(when(col("ev") === 1, col(s"x$p")).otherwise(lit(0.0))).as(s"ex_$p"))): _*)
    // suffix sums S(t) = Σ_{t_j >= t} = total − exclusive prefix, one
    // distributed ascending pass over ALL risk terms at once
    val terms = "w0" +: (0 until k).map(p => s"w1_$p") ++:
      pairs.map { case (p, q) => s"w2_${p}_$q" }
    graft.ops.Rank.withPrefixSums(perT, Seq(col("t")), terms)
  }

  case class Model(
      beta: Array[Double],
      hazardRatios: Array[Double],
      se: Array[Double], // sqrt diag of the inverse observed information
      loglik: Double,
      iters: Int,
      n: Long,
      nEvents: Long,
      converged: Boolean = true) {
    /** Wald z per covariate. */
    def z: Array[Double] = beta.zip(se).map { case (b, s) => b / s }
  }

  def fit(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      xCols: Seq[String],
      maxIter: Int = 25,
      tol: Double = 1e-9): Model = {
    val k = xCols.size
    require(k >= 1, "Cox.fit needs at least one covariate")
    require(maxIter >= 1, "Cox.fit: maxIter must be >= 1")
    val base = df.select(
      (col(durationCol).cast("double").as("t") +:
        col(eventCol).cast("int").as("ev") +:
        xCols.zipWithIndex.map { case (c, i) => col(c).cast("double").as(s"x$i") }): _*)
      .localCheckpoint(true)

    val nRow = base.agg(count(lit(1)), sum(col("ev").cast("long"))).head()
    val n = nRow.getLong(0); val nEvents = nRow.getLong(1)
    require(nEvents > 0, "Cox.fit: no events (all rows censored)")

    val pairs = for { p <- 0 until k; q <- p until k } yield (p, q)

    var beta: Array[Double] = Array.fill(k)(0.0)
    var loglik = Double.NegativeInfinity
    var hLast: Array[Array[Double]] = null
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val cum = iterationFrame(base, beta, k, pairs)
      def sfx(t: String) = col(s"__tot_$t") - col(s"__cum_$t") + col(t)
      val s0 = sfx("w0")
      val aggCols =
        sum(col("ev_eta") - col("dt").cast("double") * log(s0)).as("ll") +:
          (0 until k).map(p =>
            sum(col(s"ex_$p") - col("dt").cast("double") * sfx(s"w1_$p") / s0).as(s"g$p")) ++:
          pairs.map { case (p, q) =>
            sum(col("dt").cast("double") * (sfx(s"w2_${p}_$q") / s0 -
              (sfx(s"w1_$p") / s0) * (sfx(s"w1_$q") / s0))).as(s"h${p}_$q")
          }
      val r = cum.where(col("dt") > 0).agg(aggCols.head, aggCols.tail: _*).head()
      val ll = r.getDouble(0)
      val g = (0 until k).map(p => r.getDouble(1 + p)).toArray
      val h = Array.ofDim[Double](k, k)
      pairs.zipWithIndex.foreach { case ((p, q), i) =>
        val v = r.getDouble(1 + k + i); h(p)(q) = v; h(q)(p) = v
      }
      val delta = LinAlg.solve(h.map(_.clone()), g)
      hLast = h
      beta = beta.zip(delta).map { case (b, d) => b + d }
      done = delta.map(math.abs).max < tol && (ll - loglik).abs < 1e-12 * (1 + ll.abs)
      loglik = ll
      iter += 1
    }
    // Wald SEs from the observed information at (essentially) the MLE:
    // when the loop CONVERGED the final Newton step is below tol, so the
    // Hessian the last pass already reduced is the MLE's to within tol —
    // no extra distributed work. On a maxIter exit that Hessian is stale
    // by a full (possibly large) Newton step, so it is recomputed at the
    // returned beta (one extra iterationFrame pass, unconverged exits
    // only) and the `converged` flag makes the exit mode detectable.
    val hAtBeta =
      if (done) hLast
      else {
        val cum = iterationFrame(base, beta, k, pairs)
        def sfx(t: String) = col(s"__tot_$t") - col(s"__cum_$t") + col(t)
        val s0 = sfx("w0")
        val aggCols = pairs.map { case (p, q) =>
          sum(col("dt").cast("double") * (sfx(s"w2_${p}_$q") / s0 -
            (sfx(s"w1_$p") / s0) * (sfx(s"w1_$q") / s0))).as(s"h${p}_$q")
        }
        val r = cum.where(col("dt") > 0).agg(aggCols.head, aggCols.tail: _*).head()
        val h = Array.ofDim[Double](k, k)
        pairs.zipWithIndex.foreach { case ((p, q), i) =>
          val v = r.getDouble(i); h(p)(q) = v; h(q)(p) = v
        }
        h
      }
    val se = LinAlg.inverse(hAtBeta).zipWithIndex.map { case (row, i) => math.sqrt(row(i)) }
    Model(beta, beta.map(math.exp), se, loglik, iter, n, nEvents, converged = done)
  }

  /** Per-covariate summary frame for a fitted model: coef, hazard
    * ratio, Wald SE and z. 6dp via the portable floor-quantizer
    * (chain-produced floats).
    */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model, names: Seq[String]): DataFrame = {
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    names.zipWithIndex.map { case (nm, i) =>
      (nm, q6(m.beta(i)), q6(m.hazardRatios(i)), q6(m.se(i)), q6(m.beta(i) / m.se(i))) }
      .toDF("covariate", "coef", "hazard_ratio", "se", "z")
      .withColumn("n", lit(m.n))
      .withColumn("n_events", lit(m.nEvents))
      .withColumn("iters", lit(m.iters))
  }
}
