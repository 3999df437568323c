package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Instrumental variables / two-stage least squares — the natural next
  * estimator beyond the reference's OLS/FE surface (the reference's
  * `estimate` assumes exogenous regressors; applied panel work reaches
  * for 2SLS the moment they aren't).
  *
  *   β₂ₛₗₛ = (B' A⁻¹ B)⁻¹ B' A⁻¹ c,   A = Z'Z, B = Z'X, c = Z'y
  *
  * where X = [endogenous | exogenous (| intercept)] and Z =
  * [instruments | exogenous (| intercept)] — exogenous controls
  * instrument themselves.
  *
  * Scale shape: the [[Ols]] pattern exactly — ONE distributed
  * aggregation computes the Gram of every distinct column in [y X Z]
  * (k(k+1)/2 sums, map-side combined), then all block algebra is
  * driver-side on k×k matrices. No second data pass, no per-row
  * fitted-value materialization: the first stage exists only inside the
  * B' A⁻¹ products. Homoskedastic variance comes from the same Gram
  * identities (SSR against the ACTUAL regressors, the 2SLS convention).
  */
object Iv {

  final case class IvModel(
      names: Seq[String],
      coef: Array[Double],
      n: Long,
      /** (X' Pz X)⁻¹ — the 2SLS bread. */
      bread: Array[Array[Double]],
      sigma2: Double,
      /** Instrument column names ("(intercept)" literal allowed) and the
        * first-stage projection A⁻¹B = (Z'Z)⁻¹Z'X — what the clustered
        * sandwich needs beyond the bread.
        */
      zNames: Seq[String],
      proj: Array[Array[Double]],
      /** Per-endogenous-regressor first-stage F statistic for the
        * EXCLUDED instruments (the weak-instrument diagnostic; the
        * folk threshold is F ≳ 10, Staiger–Stock). Computed from the
        * same Gram — no extra data pass.
        */
      firstStageF: Array[Double]
  ) {
    def variance: Array[Array[Double]] = bread.map(_.map(_ * sigma2))
    def se: Array[Double] = variance.zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }
  }

  /** Fit y on [endog | exog] instrumenting endog with `instruments`.
    * Requires at least as many instruments as endogenous regressors.
    */
  def fit(
      df: DataFrame,
      y: String,
      endog: Seq[String],
      instruments: Seq[String],
      exog: Seq[String] = Nil,
      intercept: Boolean = true
  ): IvModel = {
    require(endog.nonEmpty, "no endogenous regressors")
    require(
      instruments.length >= endog.length,
      s"under-identified: ${instruments.length} instruments for ${endog.length} endogenous")

    // distinct data columns, one Gram pass over all of them + y
    val baseNames = endog ++ exog ++ instruments
    val base: Seq[Column] = baseNames.map(c => col(c).cast("double"))
    val cols: Seq[Column] = (if (intercept) Seq(lit(1.0)) else Nil) ++ base
    val yc = col(y).cast("double")
    val k = cols.length

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
    val cy = Array.tabulate(k)(i => row.getDouble(p + i))
    p += k
    val yty = row.getDouble(p)
    val n = row.getLong(p + 1)

    // index sets into the shared Gram: X = [int | endog | exog],
    // Z = [int | instruments | exog]
    val off = if (intercept) 1 else 0
    val xIdx = (if (intercept) Seq(0) else Nil) ++
      endog.indices.map(off + _) ++
      exog.indices.map(off + endog.length + _)
    val zIdx = (if (intercept) Seq(0) else Nil) ++
      instruments.indices.map(off + endog.length + exog.length + _) ++
      exog.indices.map(off + endog.length + _)

    def block(rows: Seq[Int], colIdx: Seq[Int]): Array[Array[Double]] =
      rows.map(i => colIdx.map(j => g(i)(j)).toArray).toArray
    val a = block(zIdx, zIdx) // Z'Z
    val b = block(zIdx, xIdx) // Z'X
    val cz = zIdx.map(cy).toArray // Z'y

    val aInv = LinAlg.inverse(a)
    val bt = b.transpose
    val btAinv = LinAlg.matMul(bt, aInv)
    val m = LinAlg.matMul(btAinv, b) // X'Pz X
    val rhs = LinAlg.matVec(btAinv, cz) // X'Pz y
    val beta = LinAlg.solve(m, rhs)

    // SSR against the ACTUAL X (2SLS convention): y'y − 2β'X'y + β'X'Xβ
    val xx = block(xIdx, xIdx)
    val xy = xIdx.map(cy).toArray
    val ssr = yty - 2.0 * LinAlg.dot(beta, xy) +
      LinAlg.dot(beta, LinAlg.matVec(xx, beta))
    val dof = (n - xIdx.length).toDouble
    val xNames = (if (intercept) Seq("(intercept)") else Nil) ++ endog ++ exog
    val zNames = (if (intercept) Seq("(intercept)") else Nil) ++ instruments ++ exog

    // first-stage F per endogenous column, from Gram identities:
    // SSR of regressing column t on index set S is g(t,t) − b'(S't)
    def ssrOn(t: Int, sIdx: Seq[Int]): Double = {
      val gss = sIdx.map(i => sIdx.map(j => g(i)(j)).toArray).toArray
      val sc = sIdx.map(i => g(i)(t)).toArray
      val bS = LinAlg.solve(gss, sc)
      g(t)(t) - LinAlg.dot(bS, sc)
    }
    val restrictedIdx = (if (intercept) Seq(0) else Nil) ++
      exog.indices.map(off + endog.length + _)
    val fStats = endog.indices.map { e =>
      val t = off + e
      val ssrU = ssrOn(t, zIdx)
      val ssrR = if (restrictedIdx.nonEmpty) ssrOn(t, restrictedIdx) else g(t)(t)
      val q = instruments.length.toDouble
      ((ssrR - ssrU) / q) / (ssrU / (n - zIdx.length).toDouble)
    }.toArray

    IvModel(xNames, beta, n, LinAlg.inverse(m), ssr / dof, zNames,
      LinAlg.matMul(aInv, b), fStats)
  }

  /** Cluster-robust 2SLS covariance — the IV sandwich
    *   (X'PzX)⁻¹ P' [Σ_g (Z_g'u_g)(Z_g'u_g)'] P (X'PzX)⁻¹,  P = (Z'Z)⁻¹Z'X
    * with u = y − Xβ against the ACTUAL regressors. Distributed shape =
    * [[Ols.varianceClustered]] exactly: one groupBy(cluster) computing
    * the per-cluster score vector Σ z·u (map-side combined), one tiny
    * aggregate of the kz(kz+1)/2 outer-product sums, driver sandwich.
    */
  def varianceClustered(
      df: DataFrame,
      model: IvModel,
      y: String,
      cluster: String
  ): Array[Array[Double]] = {
    val kz = model.zNames.length
    def asCol(name: String): Column =
      if (name == "(intercept)") lit(1.0) else col(name).cast("double")
    val u = model.names.zip(model.coef).foldLeft(col(y).cast("double")) {
      case (acc, (name, b)) => acc - asCol(name) * b
    }
    val zcols = model.zNames.map(asCol)
    val scoreAggs = (0 until kz).map(i => sum(col("__u") * zcols(i)).as(s"s_$i"))
    val perCluster = df
      .withColumn("__u", u)
      .groupBy(col(cluster))
      .agg(scoreAggs.head, scoreAggs.tail: _*)
    val meatAggs = for (i <- 0 until kz; j <- i until kz)
      yield sum(col(s"s_$i") * col(s"s_$j")).as(s"m_${i}_$j")
    val row = perCluster.agg(meatAggs.head, meatAggs.tail: _*).head()
    val meat = Array.ofDim[Double](kz, kz)
    var p = 0
    for (i <- 0 until kz; j <- i until kz) {
      val v = row.getDouble(p); p += 1
      meat(i)(j) = v; meat(j)(i) = v
    }
    val mid = LinAlg.matMul(LinAlg.matMul(model.proj.transpose, meat), model.proj)
    LinAlg.matMul(LinAlg.matMul(model.bread, mid), model.bread)
  }

  def seClustered(df: DataFrame, model: IvModel, y: String, cluster: String): Array[Double] =
    varianceClustered(df, model, y, cluster).zipWithIndex.map { case (r, i) => math.sqrt(r(i)) }

  /** Two-way cluster-robust 2SLS covariance (Cameron–Gelbach–Miller):
    * V_a + V_b − V_{a∩b}, each term the one-groupBy IV sandwich above.
    */
  def varianceClustered2(
      df: DataFrame,
      model: IvModel,
      y: String,
      clusterA: String,
      clusterB: String
  ): Array[Array[Double]] = {
    // length-prefixed null-safe key ([[Ols.interactionKey]]): ("1","12")
    // and ("11","2") must not collide, and NULLs must not merge cells
    val inter = df.withColumn("__ab", Ols.interactionKey(clusterA, clusterB))
    val va = varianceClustered(df, model, y, clusterA)
    val vb = varianceClustered(df, model, y, clusterB)
    val vab = varianceClustered(inter, model, y, "__ab")
    Array.tabulate(model.coef.length, model.coef.length)((i, j) =>
      va(i)(j) + vb(i)(j) - vab(i)(j))
  }

  def seClustered2(
      df: DataFrame, model: IvModel, y: String, clusterA: String, clusterB: String
  ): Array[Double] =
    varianceClustered2(df, model, y, clusterA, clusterB)
      .zipWithIndex.map { case (r, i) => math.sqrt(math.max(r(i), 0.0)) }

  /** A fitted panel-IV: the 2SLS model over the DEMEANED columns (names
    * carry the `__dm` suffix — they are what the coefficients and any
    * variance computation refer to) plus the demeaned frame itself, so
    * cluster-robust variances can be computed correctly:
    * `Iv.varianceClustered(p.demeaned, p.model, "y__dm", "firm")`
    * (the FE columns survive demeaning and serve as cluster keys).
    */
  final case class PanelIv(model: IvModel, demeaned: DataFrame) {
    def coef: Array[Double] = model.coef
    def se: Array[Double] = model.se
  }

  /** Panel IV (the `xtivreg fe`-shaped estimator): absorb fixed effects
    * by within-demeaning y, X and Z together (one
    * [[FixedEffects.demean]] pass — alternating projections for 2+
    * FEs), then 2SLS on the demeaned columns with no intercept (demeaned
    * data is mean-zero by construction). The FWL logic that justifies
    * the reference's within estimator extends to IV: instrumenting with
    * demeaned Z is equivalent to including the FE dummies in both
    * stages. The model's names keep the `__dm` suffix on purpose — a
    * renamed copy would make every residual-based variance API silently
    * read the WRONG (un-demeaned) columns.
    */
  def fitWithFE(
      df: DataFrame,
      y: String,
      endog: Seq[String],
      instruments: Seq[String],
      fes: Seq[String],
      exog: Seq[String] = Nil,
      maxSweeps: Int = 500,
      tol: Double = 1e-9
  ): PanelIv = {
    require(fes.nonEmpty, "no fixed effects — use fit()")
    val valueCols = (Seq(y) ++ endog ++ exog ++ instruments).distinct
    val (dm, _) = FixedEffects.demean(
      df.select((fes ++ valueCols).distinct.map(col): _*), valueCols, fes, maxSweeps, tol)
    val m = fit(
      dm,
      s"${y}__dm",
      endog.map(c => s"${c}__dm"),
      instruments.map(c => s"${c}__dm"),
      exog.map(c => s"${c}__dm"),
      intercept = false)
    // Homoskedastic dof must charge the ABSORBED effects (the xtivreg,fe
    // convention, same correction as FeModel.seHomoskedastic): the inner
    // 2SLS on demeaned columns used dof = n − k, but the demeaning spent
    // Σ_f G_f − (#FEs − 1) further degrees of freedom. One tiny
    // count_distinct aggregate; clustered SEs don't use sigma2.
    val gcAggs = fes.map(f => count_distinct(col(f)).as(s"__g_$f"))
    val gcRow = dm.agg(gcAggs.head, gcAggs.tail: _*).head()
    val absorbed = fes.indices.map(gcRow.getLong).sum - (fes.length - 1)
    val k = m.coef.length
    val dofFe = (m.n - k - absorbed).toDouble
    require(dofFe > 0, s"non-positive dof: n=${m.n} k=$k absorbed=$absorbed")
    PanelIv(m.copy(sigma2 = m.sigma2 * (m.n - k).toDouble / dofFe), dm)
  }
}
