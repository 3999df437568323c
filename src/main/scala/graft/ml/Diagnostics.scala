package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-fit regression diagnostics — the checks an analyst runs on an
  * [[Ols]] fit before trusting its standard errors: serial-correlation-
  * robust covariance (Driscoll–Kraay), heteroskedasticity (Breusch–
  * Pagan) and autocorrelation (Durbin–Watson). Every statistic is a
  * closed form over sums the cluster produces in one or two passes,
  * and every one is exactly replayable in ANSI SQL.
  */
object Diagnostics {

  private def xCols(model: OlsModel): Seq[Column] = model.xNames.map {
    case "(intercept)" => lit(1.0)
    case name          => col(name).cast("double")
  }

  /** Driscoll–Kraay (1998) covariance: serial- AND cross-sectionally-
    * robust for panels/time series. The per-period score vector
    * h_t = Σ_{i∈t} u_it·x_it collapses the corpus to a PERIOD-length
    * series (one groupBy — at 100 TB that is thousands of rows, not
    * billions); the Newey–West kernel then runs over that tiny series
    * with Bartlett weights w_l = 1 − l/(L+1):
    * meat = Γ₀ + Σ_{l=1..L} w_l(Γ_l + Γ_l'), Γ_l = Σ_t h_t h_{t−l}',
    * V = (X'X)⁻¹ meat (X'X)⁻¹. Lag products via window lags on the
    * period frame — no self-join, no corpus re-scan.
    */
  def varianceDriscollKraay(
      df: DataFrame,
      model: OlsModel,
      y: String,
      timeCol: String,
      maxLag: Int
  ): Array[Array[Double]] = {
    val k = model.coef.length
    val xs = xCols(model)
    val u = Ols.residualCol(model, y)
    val scoreAggs = (0 until k).map(i => sum(col("__u") * xs(i)).as(s"h_$i"))
    val periods = df
      .withColumn("__u", u)
      .groupBy(col(timeCol).as("__t"))
      .agg(scoreAggs.head, scoreAggs.tail: _*)

    val w = Window.orderBy("__t")
    val withLags = (1 to maxLag).foldLeft(periods) { (d, l) =>
      (0 until k).foldLeft(d) { (d2, i) =>
        d2.withColumn(s"h_${i}_lag$l", lag(col(s"h_$i"), l).over(w))
      }
    }
    val gammaAggs =
      (for (i <- 0 until k; j <- 0 until k) yield sum(col(s"h_$i") * col(s"h_$j")).as(s"g0_${i}_$j")) ++
        (for (l <- 1 to maxLag; i <- 0 until k; j <- 0 until k)
          yield sum(col(s"h_$i") * col(s"h_${j}_lag$l")).as(s"g${l}_${i}_$j"))
    val row = withLags.na.fill(0.0).agg(gammaAggs.head, gammaAggs.tail: _*).head()

    var p = 0
    val meat = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- 0 until k) { meat(i)(j) = row.getDouble(p); p += 1 }
    for (l <- 1 to maxLag) {
      val wl = 1.0 - l.toDouble / (maxLag + 1)
      for (i <- 0 until k; j <- 0 until k) {
        val g = row.getDouble(p); p += 1
        meat(i)(j) += wl * g
        meat(j)(i) += wl * g
      }
    }
    val bread = LinAlg.inverse(model.gram)
    val tmp = LinAlg.matMul(bread, meat)
    LinAlg.matMul(tmp, bread)
  }

  def seDriscollKraay(df: DataFrame, model: OlsModel, y: String, timeCol: String, maxLag: Int): Array[Double] =
    varianceDriscollKraay(df, model, y, timeCol, maxLag)
      .zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Breusch–Pagan LM test for heteroskedasticity: regress u² on the
    * regressors; LM = n·R² of that auxiliary regression, χ²(k−1) under
    * homoskedasticity. One extra Gram pass with u² as the outcome.
    */
  def breuschPagan(df: DataFrame, model: OlsModel, y: String): (Double, Long) = {
    val u = Ols.residualCol(model, y)
    val aux = Ols.fit(
      df.withColumn("__u2", u * u),
      "__u2",
      model.xNames.filter(_ != "(intercept)"))
    // R² = 1 − SSR/SST from the aux model's own gram identities
    // (gram(0)(0) = n, xty(0) = Σu² since column 0 is the intercept)
    val ybar = aux.xty(0) / aux.gram(0)(0)
    val sst = aux.yty - aux.gram(0)(0) * ybar * ybar
    val r2 = 1.0 - aux.ssr / sst
    (aux.n.toDouble * r2, aux.n)
  }

  /** Durbin–Watson statistic over a total time order:
    * DW = Σ_t (u_t − u_{t−1})² / Σ u² — ≈ 2 under no first-order
    * autocorrelation, → 0 under positive, → 4 under negative. Pass
    * enough `order` columns for a TOTAL order (the
    * [[graft.ml.Panel.firstDifference]] rule).
    *
    * Scale shape: a naive `Window.orderBy(time)` funnels the corpus
    * through ONE task (the AUC lesson, [[Eval.auc]]); instead rows are
    * RANGE-partitioned and sorted on the time order, each partition
    * reduces to (Σdu² internal, Σu², first u, last u, n), and the
    * driver stitches the partition-boundary (first − previous last)²
    * terms — exact, with only #partitions rows leaving the cluster.
    */
  def durbinWatson(df: DataFrame, model: OlsModel, y: String, order: Seq[String]): Double = {
    val parts = df
      .withColumn("__u", Ols.residualCol(model, y))
      .select((order.map(col) :+ col("__u")): _*)
      .repartitionByRange(order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
      .select(col("__u"))
      .rdd
      .mapPartitionsWithIndex { (idx, it) =>
        var n = 0L; var sumSq = 0.0; var sumDu2 = 0.0
        var first = 0.0; var last = 0.0; var prev = 0.0
        it.foreach { row =>
          val u = row.getDouble(0)
          if (n == 0L) first = u
          else { val d = u - prev; sumDu2 += d * d }
          sumSq += u * u
          prev = u; last = u; n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator((idx, n, sumSq, sumDu2, first, last))
      }
      .collect()
      .sortBy(_._1)

    var num = 0.0; var den = 0.0
    var prevLast = Double.NaN
    parts.foreach { case (_, _, sumSq, sumDu2, first, last) =>
      num += sumDu2
      if (!prevLast.isNaN) { val d = first - prevLast; num += d * d }
      den += sumSq
      prevLast = last
    }
    num / den
  }

  /** Benjamini–Hochberg FDR control over a frame of test results — the
    * multiple-testing gate the per-group test family needs (run
    * [[graft.ops.Drift.ksTest]] / [[graft.ops.Stats.welchT]] over 500
    * sources and ~25 "drifting" groups appear at α=0.05 by chance
    * alone): rank p ascending (ties broken by the key columns so the
    * rank — and therefore the flag set — is deterministic and
    * replayable), find k* = max{i : p_(i) ≤ α·i/m}, flag ranks ≤ k*.
    *
    * The rank runs through [[graft.ops.Rank.withGlobalRowNumber]]
    * (range partition + broadcast offsets — exact, NO single-partition
    * WindowExec), so BH scales past hypothesis frames that are
    * themselves corpus-sized (per-token tests over a web-scale vocab).
    * The step-up cutoff is a 1-row broadcast joined back.
    */
  def bhFdr(df: DataFrame, pCol: String, alpha: Double, tieBreak: Seq[String]): DataFrame = {
    val m = df.count()
    val ranked = graft.ops.Rank
      .withGlobalRowNumber(df, "rank", col(pCol).asc +: tieBreak.map(col(_).asc))
      .withColumn("rank", col("rank").cast("int"))
      .withColumn("bh_crit", round(lit(alpha) * col("rank") / m, 10))
    val kStar = ranked
      .agg(coalesce(max(when(col(pCol) <= col("bh_crit"), col("rank"))), lit(0)).as("k_star"))
    ranked
      .crossJoin(broadcast(kStar))
      .withColumn("significant", (col("rank") <= col("k_star")).cast("int"))
  }

  /** Per-key autocorrelation function + Ljung–Box Q — "is this entity's
    * metric white noise?" across every user/source at once (the
    * portmanteau sibling of the single-series [[durbinWatson]]).
    *
    * ρ_k = Σ_{t>k}(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² with the FULL-series
    * mean/denominator (the standard ACF; statsmodels' default), and
    * Q_K = n(n+2) Σ_{k≤K} ρ_k²/(n−k). Implementation: per-key
    * `row_number` over the keyed window (sharded on the key — never
    * single-partition), ONE self-join with `1 ≤ Δrn ≤ maxLag` covering
    * every lag at once (band join on the key; each row meets ≤ maxLag
    * partners, so the join is O(n·maxLag), not O(n²)), then a
    * (key, lag) aggregate against broadcast per-key moments. The
    * cumulative Q runs over ≤ maxLag rows per key. Keys with n ≤
    * maxLag or zero variance are dropped (ρ undefined).
    * Returns one row per (key, lag): n, rho, lb_q.
    */
  def ljungBox(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      tieCol: String,
      maxLag: Int): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"),
      col(valueCol).cast("double").as("x"), col(tieCol).as("tb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("t"), col("tb"))))
      .select("k", "rn", "x")
    val moments = base.groupBy("k").agg(
      count(lit(1)).as("n"),
      avg("x").as("mu"),
      (sum(col("x") * col("x")) - count(lit(1)) * avg("x") * avg("x")).as("den"))
      .where(col("n") > maxLag && col("den") > 0)
    val a = base.as("a"); val b = base.as("b")
    val lagged = a.join(b,
      col("a.k") === col("b.k") &&
        col("a.rn") - col("b.rn") >= 1 && col("a.rn") - col("b.rn") <= maxLag)
      .select(col("a.k").as("k"), (col("a.rn") - col("b.rn")).as("lag"),
        col("a.x").as("xt"), col("b.x").as("xl"))
    val rho = lagged.join(moments, Seq("k"))
      .groupBy(col("k"), col("lag"))
      .agg(
        first("n").as("n"),
        (sum((col("xt") - col("mu")) * (col("xl") - col("mu"))) /
          first("den")).as("rho_raw"))
    val cum = Window.partitionBy("k").orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rho
      .withColumn("lb_raw",
        col("n") * (col("n") + 2) *
          sum(col("rho_raw") * col("rho_raw") / (col("n") - col("lag"))).over(cum))
      .select(
        col("k").as(keyCol), col("lag"), col("n"),
        q6(col("rho_raw")).as("rho"), q6(col("lb_raw")).as("lb_q"))
  }
}
