package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed ordinary least squares — Spark-first version of the
  * reference's no-FE branch of `estimate` (reference: hdfe/hdfe.py:66-71)
  * plus its variance options (hdfe.py:153-181).
  *
  * Design for 100 TB: the data never leaves the cluster. One codegen'd
  * aggregation pass computes the Gram matrix X'X (k(k+1)/2 sums), X'y,
  * y'y and n with map-side partial aggregation; the k×k normal equations
  * are solved on the driver ([[LinAlg]]). Homoskedastic variance needs NO
  * second pass (SSR = y'y - 2b'X'y + b'Gb). Cluster-robust variance is
  * one extra groupBy(cluster) pass that reduces to k sums per cluster and
  * a k×k outer-product reduce (reference: hdfe.py:159-175).
  */
case class OlsModel(
    xNames: Seq[String],          // names of columns actually regressed (post rank-check), intercept first if present
    coef: Array[Double],
    n: Long,
    gram: Array[Array[Double]],   // X'X of the kept columns
    xty: Array[Double],
    yty: Double,
    droppedCols: Seq[String]      // collinear columns removed by checkRank
) {
  /** Sum of squared residuals, from Gram identities (no data pass). */
  def ssr: Double = {
    val gb = LinAlg.matVec(gram, coef)
    yty - 2.0 * LinAlg.dot(coef, xty) + LinAlg.dot(coef, gb)
  }
  /** sigma^2 = SSR / (n - k) (reference: hdfe.py:179). */
  def sigma2: Double = ssr / (n - coef.length).toDouble
  /** Homoskedastic covariance sigma^2 (X'X)^-1. */
  def varianceHomoskedastic: Array[Array[Double]] =
    LinAlg.inverse(gram).map(_.map(_ * sigma2))
  def seHomoskedastic: Array[Double] =
    varianceHomoskedastic.zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
}

object Ols {

  /** Fit y ~ xs (+ intercept). Columns may be arbitrary expressions over
    * `df`. With `checkRank=true`, collinear columns are detected from the
    * Gram matrix and dropped (reference: estimate(check_rank=True)).
    */
  def fit(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      intercept: Boolean = true,
      checkRank: Boolean = false,
      tol: Double = 1e-7
  ): OlsModel = {
    val names = (if (intercept) Seq("(intercept)") else Nil) ++ xs
    val cols: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xs.map(c => col(c).cast("double"))
    val yc = col(y).cast("double")
    val k = cols.length

    // single-pass Gram aggregation
    val aggs: Seq[Column] =
      (for (i <- 0 until k; j <- i until k) yield sum(cols(i) * cols(j)).as(s"g_${i}_$j")) ++
        (0 until k).map(i => sum(cols(i) * yc).as(s"c_$i")) ++
        Seq(sum(yc * yc).as("yty"), count(lit(1)).as("n"))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()

    var p = 0
    val g = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      g(i)(j) = v; g(j)(i) = v
    }
    val c = Array.tabulate(k) { i => row.getDouble(p + i) }
    p += k
    val yty = row.getDouble(p)
    val n = row.getLong(p + 1)

    fromGram(names, g, c, yty, n, checkRank, tol)
  }

  /** Solve the normal equations from an ALREADY-AGGREGATED Gram: X'X,
    * X'y, y'y, n. This is the back half of [[fit]], exposed so callers
    * that can produce the Gram without a fact pass (e.g.
    * [[FixedEffects]], whose cell statistics determine the demeaned
    * Gram exactly) skip the data entirely.
    */
  def fromGram(
      names: Seq[String],
      g: Array[Array[Double]],
      c: Array[Double],
      yty: Double,
      n: Long,
      checkRank: Boolean = false,
      tol: Double = 1e-7
  ): OlsModel = {
    val k = names.length
    val (keptIdx, droppedNames) =
      if (checkRank) {
        val (dropped, kept) = LinAlg.collinearFromGram(g, tol)
        (kept, dropped.map(names))
      } else (0 until k, Nil)

    val gk = keptIdx.map(i => keptIdx.map(j => g(i)(j)).toArray).toArray
    val ck = keptIdx.map(c).toArray
    val b = LinAlg.solve(gk, ck)
    OlsModel(keptIdx.map(names), b, n, gk, ck, yty, droppedNames.toSeq)
  }

  /** Frequency-weighted least squares: minimizes Σ wᵢ(yᵢ − xᵢ'b)².
    * Same single Gram pass with every sum w-scaled; `n` becomes Σw
    * (frequency-weight semantics: a weight-w row behaves exactly like w
    * repeated rows, including in the dof — pinned by spec against the
    * row-expanded fit). This is also the COMPRESSED-regression
    * primitive: aggregate duplicate (y, x) rows to (count, values) once
    * and regress the distinct rows weighted by count — at 100 TB the
    * pass over distinct rows can be orders of magnitude smaller.
    */
  def fitWeighted(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      weight: String,
      intercept: Boolean = true
  ): OlsModel = {
    val names = (if (intercept) Seq("(intercept)") else Nil) ++ xs
    val cols: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xs.map(c => col(c).cast("double"))
    val yc = col(y).cast("double")
    val w = col(weight).cast("double")
    val k = cols.length

    val aggs: Seq[Column] =
      (for (i <- 0 until k; j <- i until k) yield sum(w * cols(i) * cols(j)).as(s"g_${i}_$j")) ++
        (0 until k).map(i => sum(w * cols(i) * yc).as(s"c_$i")) ++
        Seq(sum(w * yc * yc).as("yty"), sum(w).as("n"))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()

    var p = 0
    val g = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      g(i)(j) = v; g(j)(i) = v
    }
    val c = Array.tabulate(k) { i => row.getDouble(p + i) }
    p += k
    val yty = row.getDouble(p)
    val n = math.round(row.getDouble(p + 1))
    OlsModel(names, LinAlg.solve(g, c), n, g, c, yty, Nil)
  }

  /** Ridge regression: solve (X'X + λ·D) b = X'y where D is the
    * identity with a ZERO in the intercept slot (the level is never
    * penalized). Reuses the [[fit]] single-pass Gram — the penalty is a
    * driver-side diagonal add, so a λ-sweep (model selection) costs ONE
    * distributed pass total, not one per λ. No standardization is
    * applied; callers wanting scale-invariant penalties standardize
    * first (`sim.Embed.standardizer` for vectors, or plain
    * (x−μ)/σ columns).
    */
  def fitRidge(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      lambda: Double,
      intercept: Boolean = true
  ): OlsModel = {
    val base = fit(df, y, xs, intercept)
    ridgeFromModel(base, lambda, intercept)
  }

  /** The driver-side back half of [[fitRidge]]: penalize an
    * already-aggregated Gram. Exposed so a λ-sweep reuses one pass.
    */
  def ridgeFromModel(base: OlsModel, lambda: Double, intercept: Boolean = true): OlsModel = {
    val k = base.xNames.length
    val g = Array.tabulate(k, k) { (i, j) =>
      base.gram(i)(j) + (if (i == j && !(intercept && i == 0)) lambda else 0.0)
    }
    base.copy(coef = LinAlg.solve(g, base.xty), gram = g)
  }

  /** Multi-outcome least squares (the reference's 2-D `y`,
    * hdfe.py:129-135 loops a solver per outcome over the same design).
    * graft shares ONE distributed pass: X'X is aggregated once and X'y_j
    * for every outcome in the same codegen'd aggregate; only the k×k
    * driver solves repeat per outcome.
    */
  def fitMulti(
      df: DataFrame,
      ys: Seq[String],
      xs: Seq[String],
      intercept: Boolean = true
  ): Map[String, OlsModel] = {
    val names = (if (intercept) Seq("(intercept)") else Nil) ++ xs
    val cols: Seq[Column] =
      (if (intercept) Seq(lit(1.0)) else Nil) ++ xs.map(c => col(c).cast("double"))
    val ycols = ys.map(y => col(y).cast("double"))
    val k = cols.length

    val aggs: Seq[Column] =
      (for (i <- 0 until k; j <- i until k) yield sum(cols(i) * cols(j)).as(s"g_${i}_$j")) ++
        ys.indices.flatMap { yi =>
          (0 until k).map(i => sum(cols(i) * ycols(yi)).as(s"c_${yi}_$i")) :+
            sum(ycols(yi) * ycols(yi)).as(s"yty_$yi")
        } ++ Seq(count(lit(1)).as("n"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    var p = 0
    val g = Array.ofDim[Double](k, k)
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      g(i)(j) = v; g(j)(i) = v
    }
    val perY = ys.map { y =>
      val c = Array.tabulate(k)(i => row.getDouble(p + i))
      p += k
      val yty = row.getDouble(p); p += 1
      (y, c, yty)
    }
    val n = row.getLong(p)
    perY.map { case (y, c, yty) =>
      y -> OlsModel(names, LinAlg.solve(g, c), n, g, c, yty, Nil)
    }.toMap
  }

  /** Fitted-value column expression — the model SERVING surface: score
    * any frame with the regressor columns (train or held-out) with a
    * codegen'd linear form, no data movement, no driver involvement.
    */
  def fittedCol(model: OlsModel): Column =
    model.xNames.zip(model.coef).map {
      case ("(intercept)", b) => lit(b)
      case (name, b)          => col(name).cast("double") * b
    }.reduce(_ + _)

  /** Residual column expression for a fitted model. */
  def residualCol(model: OlsModel, y: String): Column = {
    val terms = model.xNames.zip(model.coef).map {
      case ("(intercept)", b) => lit(b)
      case (name, b)          => col(name).cast("double") * b
    }
    terms.foldLeft(col(y).cast("double"))(_ - _)
  }

  /** Cluster-robust covariance (X'X)^-1 [Σ_g s_g s_g'] (X'X)^-1 with
    * s_g = Σ_{i∈g} u_i x_i (reference: hdfe.py:159-175; like the
    * reference, no small-sample correction). One distributed pass:
    * groupBy(cluster) reduces each cluster to k sums, a second tiny agg
    * reduces the k×k outer products.
    */
  def varianceClustered(
      df: DataFrame,
      model: OlsModel,
      y: String,
      cluster: String
  ): Array[Array[Double]] = {
    val k = model.coef.length
    val u = residualCol(model, y).as("__u")
    val xcols: Seq[Column] = model.xNames.map {
      case "(intercept)" => lit(1.0)
      case name          => col(name).cast("double")
    }
    val scoreAggs = (0 until k).map(i => sum(col("__u") * xcols(i)).as(s"s_$i"))
    val perCluster = df
      .withColumn("__u", u)
      .groupBy(col(cluster))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val meatAggs = for (i <- 0 until k; j <- i until k)
      yield sum(col(s"s_$i") * col(s"s_$j")).as(s"m_${i}_$j")
    val row = perCluster.agg(meatAggs.head, meatAggs.tail: _*).head()
    val meat = Array.ofDim[Double](k, k)
    var p = 0
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      meat(i)(j) = v; meat(j)(i) = v
    }
    val inv = LinAlg.inverse(model.gram)
    LinAlg.matMul(LinAlg.matMul(inv, meat), inv)
  }

  def seClustered(df: DataFrame, model: OlsModel, y: String, cluster: String): Array[Double] =
    varianceClustered(df, model, y, cluster).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Collision-proof interaction key for the CGM V_{a∩b} term. Each key
    * is length-prefixed (`S<len>:<value>`) so no byte INSIDE a key —
    * including the separator itself — can make ("1","12") and ("11","2")
    * collide, and NULL maps to the distinct token `N`: `concat_ws` skips
    * nulls, which would silently merge (null,"x") with ("x",null) and
    * null-keyed rows with the other dimension's bare key.
    */
  private[ml] def interactionKey(clusterA: String, clusterB: String): Column = {
    def tag(c: String): Column = {
      val s = col(c).cast("string")
      when(s.isNull, lit("N")).otherwise(concat(lit("S"), length(s).cast("string"), lit(":"), s))
    }
    concat(tag(clusterA), lit("\u0001"), tag(clusterB))
  }

  /** Two-way cluster-robust covariance (Cameron–Gelbach–Miller 2011):
    *   V = V_a + V_b − V_{a∩b}
    * — three runs of the SAME one-groupBy sandwich, the third on the
    * interaction key. Each term is one shuffle of k-vector scores;
    * nothing new moves at scale.
    */
  def varianceClustered2(
      df: DataFrame,
      model: OlsModel,
      y: String,
      clusterA: String,
      clusterB: String
  ): Array[Array[Double]] = {
    val inter = df.withColumn("__ab", interactionKey(clusterA, clusterB))
    val va = varianceClustered(df, model, y, clusterA)
    val vb = varianceClustered(df, model, y, clusterB)
    val vab = varianceClustered(inter, model, y, "__ab")
    Array.tabulate(model.coef.length, model.coef.length)((i, j) =>
      va(i)(j) + vb(i)(j) - vab(i)(j))
  }

  def seClustered2(
      df: DataFrame, model: OlsModel, y: String, clusterA: String, clusterB: String
  ): Array[Double] =
    varianceClustered2(df, model, y, clusterA, clusterB)
      .zipWithIndex.map { case (r, i) => math.sqrt(math.max(r(i), 0.0)) }

  /** Heteroskedasticity-robust (White/Eicker–Huber) covariance
    * (X'X)^-1 [Σ_i u_i² x_i x_i'] (X'X)^-1, with the HC1 small-sample
    * scale n/(n−k). Identical sandwich machinery to [[varianceClustered]]
    * with every observation its own cluster — but computed as ONE
    * map-side-combined aggregate of the k(k+1)/2 meat sums (no per-row
    * grouping shuffle: u_i² x_i x_i' is a row-local product).
    */
  def varianceHC1(
      df: DataFrame,
      model: OlsModel,
      y: String
  ): Array[Array[Double]] = {
    val k = model.coef.length
    val u = residualCol(model, y).as("__u")
    val xcols: Seq[Column] = model.xNames.map {
      case "(intercept)" => lit(1.0)
      case name          => col(name).cast("double")
    }
    val meatAggs = for (i <- 0 until k; j <- i until k)
      yield sum(col("__u") * col("__u") * xcols(i) * xcols(j)).as(s"m_${i}_$j")
    val row = df.withColumn("__u", u).agg(meatAggs.head, meatAggs.tail: _*).head()
    val meat = Array.ofDim[Double](k, k)
    var p = 0
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      meat(i)(j) = v; meat(j)(i) = v
    }
    val scale = model.n.toDouble / (model.n - k).toDouble // HC1
    val inv = LinAlg.inverse(model.gram)
    LinAlg.matMul(LinAlg.matMul(inv, meat), inv).map(_.map(_ * scale))
  }

  def seHC1(df: DataFrame, model: OlsModel, y: String): Array[Double] =
    varianceHC1(df, model, y).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Leverage-corrected robust covariance, HC2 (δ=1) and HC3 (δ=2):
    * (X'X)⁻¹ [Σ_i u_i²/(1−h_i)^δ x_i x_i'] (X'X)⁻¹ with leverage
    * h_i = x_i'(X'X)⁻¹x_i (MacKinnon–White 1985). HC1's global n/(n−k)
    * scale under-corrects exactly the high-leverage rows that drive
    * heteroskedasticity-robust bias in finite samples; HC2 makes
    * E[u_i²/(1−h_i)] = σ_i² exact under homoskedasticity, HC3
    * approximates the jackknife.
    *
    * Distribution: (X'X)⁻¹ is k×k driver state, so h_i is a ROW-LOCAL
    * codegen'd quadratic form with literal coefficients — the whole meat
    * is still ONE map-side-combined aggregate pass, identical in shape
    * to [[varianceHC1]]. No per-row hat-matrix materialization, no
    * second shuffle, scale-free at 100 TB.
    *
    * A numerically-exact-fit row has h_i → 1 and u_i → 0 (the true
    * contribution is a 0/0 → 0 limit only for HC2); 1−h_i is floored at
    * 1e-12 so such rows produce a huge-but-finite weight instead of
    * NaN-poisoning the sums — with k regressors over n ≫ k rows,
    * max h_i ≪ 1 in any non-degenerate design.
    */
  def varianceHC(
      df: DataFrame,
      model: OlsModel,
      y: String,
      delta: Int
  ): Array[Array[Double]] = {
    require(delta == 1 || delta == 2, s"delta must be 1 (HC2) or 2 (HC3), got $delta")
    val k = model.coef.length
    val inv = LinAlg.inverse(model.gram)
    val xcols: Seq[Column] = model.xNames.map {
      case "(intercept)" => lit(1.0)
      case name          => col(name).cast("double")
    }
    // h = Σ_a inv(a)(a)·x_a² + 2·Σ_{a<b} inv(a)(b)·x_a·x_b
    val hTerms =
      (0 until k).map(a => lit(inv(a)(a)) * xcols(a) * xcols(a)) ++
        (for (a <- 0 until k; b <- a + 1 until k)
          yield lit(2.0 * inv(a)(b)) * xcols(a) * xcols(b))
    val h = hTerms.reduce(_ + _)
    val u = residualCol(model, y)
    val oneMinusH = greatest(lit(1.0) - h, lit(1e-12))
    val w =
      if (delta == 1) (u * u) / oneMinusH
      else (u * u) / (oneMinusH * oneMinusH)
    val meatAggs = for (i <- 0 until k; j <- i until k)
      yield sum(col("__w") * xcols(i) * xcols(j)).as(s"m_${i}_$j")
    val row = df.withColumn("__w", w).agg(meatAggs.head, meatAggs.tail: _*).head()
    val meat = Array.ofDim[Double](k, k)
    var p = 0
    for (i <- 0 until k; j <- i until k) {
      val v = row.getDouble(p); p += 1
      meat(i)(j) = v; meat(j)(i) = v
    }
    LinAlg.matMul(LinAlg.matMul(inv, meat), inv)
  }

  def seHC2(df: DataFrame, model: OlsModel, y: String): Array[Double] =
    varianceHC(df, model, y, delta = 1).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  def seHC3(df: DataFrame, model: OlsModel, y: String): Array[Double] =
    varianceHC(df, model, y, delta = 2).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Model-selection fit statistics from the Gram identities alone (NO
    * extra data pass): R², adjusted R², RMSE, Gaussian log-likelihood,
    * AIC, BIC. SST is mean-centered when the model carries an intercept
    * (Σy rides the intercept row of X'y), uncentered otherwise — the
    * standard convention pair. σ-count: AIC/BIC charge k + 1 parameters
    * (coefficients + the error variance). Large raw sums never leave the
    * driver; only O(1) ratios (6dp) and the information criteria (2dp —
    * n-scaled) are emitted.
    */
  def fitStats(spark: org.apache.spark.sql.SparkSession, m: OlsModel): DataFrame = {
    val k = m.coef.length
    val n = m.n.toDouble
    val hasIntercept = m.xNames.headOption.contains("(intercept)")
    val sst =
      if (hasIntercept) m.yty - m.xty(0) * m.xty(0) / n // Σy = intercept row of X'y
      else m.yty
    val ssr = m.ssr
    val r2 = 1.0 - ssr / sst
    val adj = 1.0 - (1.0 - r2) * (n - (if (hasIntercept) 1.0 else 0.0)) / (n - k)
    val rmse = math.sqrt(ssr / n)
    val ll = -0.5 * n * (math.log(2.0 * math.Pi) + math.log(ssr / n) + 1.0)
    val aic = 2.0 * (k + 1) - 2.0 * ll
    val bic = math.log(n) * (k + 1) - 2.0 * ll
    import spark.implicits._
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def q2(x: Double) = math.floor(x * 1e2 + 0.5) / 1e2
    Seq((m.n, k.toLong, q6(r2), q6(adj), q6(rmse), q2(ll), q2(aic), q2(bic)))
      .toDF("n", "k", "r2", "adj_r2", "rmse", "log_lik", "aic", "bic")
  }
}
