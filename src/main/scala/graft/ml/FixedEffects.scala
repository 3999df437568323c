package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** High-dimensional fixed-effects regression — Spark-first version of the
  * reference `estimate` (reference: hdfe/hdfe.py:49-181).
  *
  * The reference offers (a) a within estimator for the first FE plus
  * dummy columns for the rest (hdfe.py:73-120) and (b) a sparse dummy
  * design solved with lsqr (hdfe.py:121-144). Neither materialized-dummy
  * path survives 100 TB. graft instead absorbs ALL fixed effects by
  * alternating projections (Halperin / MAP — the reghdfe family):
  * iteratively subtract within-group means for each FE until the group
  * means vanish. With one FE this converges in a single sweep and is
  * exactly the reference's within estimator.
  *
  * Scale design (the round-2 rewrite): alternating projections only ever
  * need per-group MEANS, and those are exactly recoverable from per-cell
  * sufficient statistics, where a cell is one distinct FE-key tuple:
  * mean_f(g) = Σ_{cells c∈g} (sum_c − n_c · Σ_f' a_f'(c)) / n_g. So ONE
  * distributed pass compresses the fact table to the cell frame
  * (count + one sum per demeaned column — map-side combined, only
  * #cells rows ever shuffle), every sweep then runs against that frame,
  * and the fact table is touched exactly twice: the aggregate and a
  * final join that applies the converged effects. Per-sweep state is the
  * per-FE effect vectors (Σ #groups rows), not a demeaned copy of the
  * data — nothing n-sized is ever checkpointed or re-materialized.
  *
  * Two regimes, same algebra:
  *  - cells fit on the driver (≤ `collectCellLimit`): collect the cell
  *    stats once and run the sweeps in local arrays — a sweep is O(#cells
  *    · #FEs · #cols) flops, so convergence to machine precision costs
  *    microseconds and ZERO extra cluster jobs;
  *  - cells too large: sweeps run on the persisted cell frame (groupBy
  *    the FE key + broadcast-join the tiny means back), with the lazy
  *    localCheckpoint-per-sweep lineage hygiene from round 1 — but on
  *    the compressed frame, whose width is 1 + #cols doubles.
  */
case class FeModel(
    yName: String,
    xNames: Seq[String],
    feNames: Seq[String],
    coef: Array[Double],
    n: Long,
    sweeps: Int,
    ols: OlsModel,
    /** demeaned frame: original columns plus `<col>__dm` for y and xs */
    demeaned: DataFrame,
    /** per-FE cumulative demeaning effect tables (see [[Demeaned]]) */
    effectTables: Option[Seq[DataFrame]] = None
) {
  /** Residuals of the full model (all FE effects absorbed):
    * u = y_dm - X_dm · b. For the 1-FE case this equals y - Xb - fe_g,
    * the reference's residual after removing fixed effects
    * (reference: hdfe.py:120).
    */
  def withResiduals(residCol: String = "resid"): DataFrame = {
    val terms = xNames.zip(coef).map { case (x, b) => col(s"${x}__dm") * b }
    demeaned.withColumn(residCol, terms.foldLeft(col(s"${yName}__dm"))(_ - _))
  }

  /** Recovered fixed effects for the single-FE model: group means of
    * y - X·b (reference: hdfe.py:104-117). Output: fe column + `effect`.
    */
  def effects: DataFrame = {
    require(feNames.length == 1, "closed-form effect recovery is defined for one FE")
    val pred = xNames.zip(coef).map { case (x, b) => col(x).cast("double") * b }
    val e = pred.foldLeft(col(yName).cast("double"))(_ - _)
    demeaned.withColumn("__e", e).groupBy(col(feNames.head)).agg(avg(col("__e")).as("effect"))
  }

  /** Recovered fixed effects of `fe` for ANY number of absorbed FEs:
    * since the whole alternating-projection operator is linear, the
    * y-equation effect of group g is a_f^y(g) − Σ_j b_j · a_f^{x_j}(g)
    * from the stored per-column demeaning effects. For one FE this
    * equals [[effects]] exactly. For ≥ 2 FEs the split across FEs is
    * unique only up to additive constants (their SUM is canonical) —
    * the same normalization freedom every multi-FE estimator has.
    * Output: fe column + `effect`.
    */
  def modelEffects(fe: String): DataFrame = {
    val f = feNames.indexOf(fe)
    require(f >= 0, s"$fe is not an absorbed FE of this model")
    val tables = effectTables.getOrElse(
      throw new IllegalStateException("this model was fitted without effect tables"))
    val e = xNames.zip(coef).foldLeft(col(s"eff_$yName")) { case (acc, (x, b)) =>
      acc - col(s"eff_$x") * b
    }
    tables(f).select(col(fe), e.as("effect"))
  }

  /** Number of distinct groups per FE — one tiny aggregate over the
    * demeaned frame (computed lazily, only for variance dof).
    */
  lazy val groupCounts: Seq[Long] = {
    val aggs = feNames.map(f => count_distinct(col(f)).as(s"__g_$f"))
    val row = demeaned.agg(aggs.head, aggs.tail: _*).head()
    feNames.indices.map(row.getLong)
  }

  /** Homoskedastic SEs with the ABSORBED degrees of freedom: the
    * reference computes sigma² = SSR / (n − cols(full dummy design))
    * (reference: hdfe.py:176-179), where the design carries all G₁
    * dummies of the first FE plus G_f − 1 for each additional FE. The
    * inner OLS on demeaned columns only knows k regressors, so correct
    * the dof here: dof = n − k − (Σ_f G_f − (#FEs − 1)).
    */
  def seHomoskedastic: Array[Double] = {
    val absorbed = groupCounts.sum - (feNames.length - 1)
    val dof = n - ols.coef.length - absorbed
    require(dof > 0, s"non-positive dof: n=$n k=${ols.coef.length} absorbed=$absorbed")
    val s2 = ols.ssr / dof.toDouble
    LinAlg.inverse(ols.gram).zipWithIndex.map { case (r, i) => math.sqrt(r(i) * s2) }
  }

  /** Cluster-robust covariance of the within estimator (scores use the
    * demeaned regressors; reference: hdfe.py:159-175).
    */
  def seClustered(cluster: String): Array[Double] =
    Ols.seClustered(demeaned, ols, s"${yName}__dm", cluster)

  /** Two-way cluster-robust covariance of the within estimator
    * (Cameron–Gelbach–Miller 2011: V_a + V_b − V_{a∩b}) — the FE
    * regression clustered on firm AND time, the most common CGM use in
    * applied panel work. Delegates the three sandwich terms to
    * [[Ols.varianceClustered2]] over the demeaned frame (the FE columns
    * survive demeaning and serve as cluster keys). Like the one-way
    * path — and the reference, hdfe.py:159-175 — no small-sample
    * correction is applied; the CGM difference can make individual
    * diagonal entries negative on pathological designs, so
    * [[seClustered2]] floors at zero the way [[Ols.seClustered2]] does.
    */
  def varianceClustered2(clusterA: String, clusterB: String): Array[Array[Double]] =
    Ols.varianceClustered2(demeaned, ols, s"${yName}__dm", clusterA, clusterB)

  def seClustered2(clusterA: String, clusterB: String): Array[Double] =
    varianceClustered2(clusterA, clusterB)
      .zipWithIndex.map { case (r, i) => math.sqrt(math.max(r(i), 0.0)) }
}

/** Result of [[FixedEffects.demeanFull]]: the demeaned frame, the sweep
  * count, and — when the solve regime tracks them — one cumulative
  * effect table per FE: (feKey, `eff_<col>` per demeaned column) such
  * that `<col>__dm` = col − Σ_f eff_f. The per-FE SPLIT is canonical
  * only up to additive constants for ≥ 2 FEs (the sum is unique; same
  * normalization freedom as reghdfe) but is deterministic for a given
  * sweep order. Both cell regimes track effects; `None` is reserved for
  * future paths that cannot.
  */
case class Demeaned(frame: DataFrame, sweeps: Int, effects: Option[Seq[DataFrame]])

object FixedEffects {

  /** Demean `cols` within each of `fes` by alternating projections.
    * Returns the input frame with added `<col>__dm` columns and the
    * number of sweeps used. For a single FE one sweep is exact.
    */
  def demean(
      df: DataFrame,
      cols: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 500,
      tol: Double = 1e-9,
      collectCellLimit: Long = 2000000L
  ): (DataFrame, Int) = {
    val d = demeanFull(df, cols, fes, maxSweeps, tol, collectCellLimit)
    (d.frame, d.sweeps)
  }

  /** [[demean]] plus the per-FE cumulative effect tables (see
    * [[Demeaned]]).
    */
  def demeanFull(
      df: DataFrame,
      cols: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 500,
      tol: Double = 1e-9,
      collectCellLimit: Long = 2000000L,
      weight: Option[String] = None
  ): Demeaned = {
    val k = cols.length
    val K = fes.length
    val dcols = cols.map(c => col(c).cast("double"))
    // frequency weights: every count becomes Σw and every sum w-scaled —
    // weighted group means fall out of the SAME cell solvers, whose cell
    // "count" is already a double
    val w = weight.map(c => col(c).cast("double")).getOrElse(lit(1.0))

    if (K == 1) {
      // one sweep is exact: subtract the (weighted) group means directly
      val fe = fes.head
      val meanAggs =
        cols.zipWithIndex.map { case (c, i) => (sum(w * dcols(i)) / sum(w)).as(s"__mean_$c") }
      val means = df.groupBy(col(fe)).agg(meanAggs.head, meanAggs.tail: _*)
      val joined = df.join(means, Seq(fe), "left")
      val out = cols.zipWithIndex.foldLeft(joined) { case (acc, (c, i)) =>
        acc.withColumn(s"${c}__dm", dcols(i) - col(s"__mean_$c"))
      }.drop(cols.map(c => s"__mean_$c"): _*)
      // with one FE the cumulative effect IS the group mean per column
      val eff = cols.zipWithIndex.foldLeft(means) { case (acc, (c, _)) =>
        acc.withColumnRenamed(s"__mean_$c", s"eff_$c")
      }
      return Demeaned(out, 1, Some(Seq(eff)))
    }

    // ---- multi-FE: ONE pass compresses facts to distinct-FE-tuple cells
    // (weight mass, per-column weighted sums, weighted sums of squares
    // for the convergence scale). Map-side combine means only #cells
    // rows shuffle.
    val statAggs = sum(w).as("__n") +:
      ((0 until k).map(i => sum(w * dcols(i)).as(s"__s_$i")) ++
        (0 until k).map(i => sum(w * dcols(i) * dcols(i)).as(s"__q_$i")))
    val cells = df.groupBy(fes.map(col): _*).agg(statAggs.head, statAggs.tail: _*).persist()
    val nCells = cells.count()

    if (nCells <= collectCellLimit) demeanDriverCells(df, cols, fes, cells, maxSweeps, tol)
    else demeanDistributedCells(df, cols, fes, cells, maxSweeps, tol)
  }

  /** Frisch–Waugh–Lovell partial-out: residualize each of `cols` on
    * `controls` after absorbing `fes` — the generalized `get_residual`
    * (reference: hdfe.py:105-120 residualizes one y on x within FEs).
    * One demean pass handles cols ++ controls together; one shared Gram
    * pass ([[Ols.fitMulti]]) fits every col's projection on the
    * controls; output adds `<col>__resid` columns. With no FEs the
    * projection includes an intercept (plain centering).
    */
  def partialOut(
      df: DataFrame,
      cols: Seq[String],
      controls: Seq[String],
      fes: Seq[String] = Nil,
      keep: Seq[String] = Nil,
      maxSweeps: Int = 500,
      tol: Double = 1e-9
  ): DataFrame = {
    val (frame, colNames, ctrlNames) =
      if (fes.isEmpty) {
        val needed = (cols ++ controls ++ keep).distinct
        (df.select(needed.map(col): _*), cols, controls)
      } else {
        val needed = (fes ++ cols ++ controls ++ keep).distinct
        val (dm, _) =
          demean(df.select(needed.map(col): _*), (cols ++ controls).distinct, fes, maxSweeps, tol)
        (dm, cols.map(c => s"${c}__dm"), controls.map(c => s"${c}__dm"))
      }
    val models = Ols.fitMulti(frame, colNames, ctrlNames, intercept = fes.isEmpty)
    cols.zip(colNames).foldLeft(frame) { case (acc, (c, cn)) =>
      val m = models(cn)
      val terms = m.xNames.zip(m.coef).map {
        case ("(intercept)", b) => lit(b)
        case (x, b)             => col(x).cast("double") * b
      }
      acc.withColumn(s"${c}__resid", terms.foldLeft(col(cn).cast("double"))(_ - _))
    }
  }

  /** Sweeps over COLLECTED cell statistics in driver arrays: each sweep
    * is O(#cells · #FEs · #cols) flops with zero cluster jobs, so the
    * classic MAP convergence-rate weakness costs microseconds, not
    * cluster sweeps. The facts then get the converged effects back via
    * per-FE broadcast joins (the effect tables are #groups rows each).
    */
  private def demeanDriverCells(
      df: DataFrame,
      cols: Seq[String],
      fes: Seq[String],
      cells: DataFrame,
      maxSweeps: Int,
      tol: Double
  ): Demeaned = {
    val k = cols.length
    val K = fes.length
    val cellSchema = cells.schema
    val rows = cells.collect()
    cells.unpersist(false)
    val nc = rows.length

    // dense group indexing per FE
    val idx = Array.fill(K)(new java.util.HashMap[Any, Integer]())
    val cellG = Array.ofDim[Int](nc, K)
    val cellN = new Array[Double](nc)
    val cellS = Array.ofDim[Double](nc, k)
    var totN = 0.0
    val totQ = new Array[Double](k)
    var ci = 0
    while (ci < nc) {
      val r = rows(ci)
      var f = 0
      while (f < K) {
        val key = r.get(f)
        var g = idx(f).get(key)
        if (g == null) { g = Integer.valueOf(idx(f).size()); idx(f).put(key, g) }
        cellG(ci)(f) = g.intValue()
        f += 1
      }
      cellN(ci) = r.getDouble(K)
      totN += cellN(ci)
      var c = 0
      while (c < k) {
        cellS(ci)(c) = r.getDouble(K + 1 + c)
        totQ(c) += r.getDouble(K + 1 + k + c)
        c += 1
      }
      ci += 1
    }
    val scale = math.max((0 until k).map(c => math.sqrt(totQ(c) / totN)).max, 1e-300)
    val gN = Array.tabulate(K)(f => new Array[Double](idx(f).size()))
    for (i <- 0 until nc; f <- 0 until K) gN(f)(cellG(i)(f)) += cellN(i)

    // cumulative per-FE, per-group, per-column effects
    val eff = Array.tabulate(K)(f => Array.ofDim[Double](idx(f).size(), k))
    var sweeps = 0
    var converged = false
    while (!converged && sweeps < maxSweeps) {
      sweeps += 1
      var delta = 0.0
      var f = 0
      while (f < K) {
        val num = Array.ofDim[Double](idx(f).size(), k)
        var i = 0
        while (i < nc) {
          val g = cellG(i)(f)
          var c = 0
          while (c < k) {
            var e = 0.0
            var f2 = 0
            while (f2 < K) { e += eff(f2)(cellG(i)(f2))(c); f2 += 1 }
            num(g)(c) += cellS(i)(c) - cellN(i) * e
            c += 1
          }
          i += 1
        }
        var g = 0
        while (g < num.length) {
          var c = 0
          while (c < k) {
            val m = num(g)(c) / gN(f)(g)
            eff(f)(g)(c) += m
            if (math.abs(m) > delta) delta = math.abs(m)
            c += 1
          }
          g += 1
        }
        f += 1
      }
      converged = delta < tol * scale
    }

    // apply: per-FE effect tables, broadcast-joined (each is #groups rows)
    val spark = df.sparkSession
    var out = cols.foldLeft(df) { (acc, c) => acc.withColumn(s"${c}__dm", col(c).cast("double")) }
    val effTables = (0 until K).map { f =>
      val schema = StructType(
        StructField(fes(f), cellSchema(f).dataType) +:
          cols.map(c => StructField(s"eff_$c", DoubleType)))
      val data = new java.util.ArrayList[Row](idx(f).size())
      val it = idx(f).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getValue.intValue()
        data.add(Row.fromSeq(e.getKey +: (0 until k).map(c => eff(f)(g)(c))))
      }
      spark.createDataFrame(data, schema)
    }
    for (f <- 0 until K) {
      val renamed = cols.zipWithIndex.foldLeft(effTables(f)) { case (acc, (c, i)) =>
        acc.withColumnRenamed(s"eff_$c", s"__eff_${f}_$i")
      }
      out = out.join(broadcast(renamed), Seq(fes(f)), "left")
    }
    out = cols.zipWithIndex.foldLeft(out) { case (acc, (c, i)) =>
      acc.withColumn(
        s"${c}__dm",
        (0 until K).foldLeft(col(s"${c}__dm"))((e, f) => e - col(s"__eff_${f}_$i")))
    }.drop((for (f <- 0 until K; i <- 0 until k) yield s"__eff_${f}_$i"): _*)
    Demeaned(out, sweeps, Some(effTables))
  }

  /** Sweeps over the PERSISTED cell frame when the cells don't fit on the
    * driver (e.g. worker×firm panels at full scale). Same algebra, but
    * the running residual sums live in the cell frame: per FE step one
    * groupBy(fe) aggregate (≤ #groups rows move) + one join back of the
    * tiny means. Lazy localCheckpoint per sweep truncates the plan; the
    * checkpointed state is #cells × (1 + #cols) doubles — never n-sized.
    */
  private def demeanDistributedCells(
      df: DataFrame,
      cols: Seq[String],
      fes: Seq[String],
      cells: DataFrame,
      maxSweeps: Int,
      tol: Double
  ): Demeaned = {
    val k = cols.length

    // convergence scale from the same cell stats — no extra fact pass
    val scaleRow = cells
      .agg(sum(col("__n")).as("n"), (0 until k).map(i => sum(col(s"__q_$i")).as(s"q_$i")): _*)
      .head()
    val totN = scaleRow.getDouble(0)
    val scale =
      math.max((0 until k).map(i => math.sqrt(scaleRow.getDouble(1 + i) / totN)).max, 1e-300)

    def checkpointRdd(d: DataFrame) =
      d.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }

    // running residual sums per cell, seeded with the raw sums
    var cur = (0 until k).foldLeft(cells) { (acc, i) => acc.withColumn(s"__r_$i", col(s"__s_$i")) }
    // cumulative per-FE effect tables (G_f rows each, columns __acc_i):
    // accumulated from the per-step means so [[FeModel.modelEffects]]
    // works in this regime too; tiny next to the cell frame
    val effAcc = scala.collection.mutable.Map.empty[String, DataFrame]
    var sweeps = 0
    var converged = false
    val history = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val meansHistory = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!converged && sweeps < maxSweeps) {
      sweeps += 1
      var delta = 0.0
      for (fe <- fes) {
        val meanAggs =
          sum(col("__n")).as("__gn") +: (0 until k).map(i => sum(col(s"__r_$i")).as(s"__m_$i"))
        val means = cur
          .groupBy(col(fe))
          .agg(meanAggs.head, meanAggs.tail: _*)
          .select(
            col(fe) +: (0 until k).map(i => (col(s"__m_$i") / col("__gn")).as(s"__mean_$i")): _*)
          .persist()
        meansHistory += means
        val d = means
          .agg(greatest((0 until k).map(i => max(abs(col(s"__mean_$i")))): _*))
          .head()
          .getDouble(0)
        delta = math.max(delta, d)
        effAcc(fe) = effAcc.get(fe) match {
          case None =>
            means.select(
              col(fe) +: (0 until k).map(i => col(s"__mean_$i").as(s"__acc_$i")): _*)
          case Some(prev) =>
            prev
              .join(means, Seq(fe), "left")
              .select(
                col(fe) +: (0 until k).map(i =>
                  (col(s"__acc_$i") + coalesce(col(s"__mean_$i"), lit(0.0))).as(s"__acc_$i")): _*)
              .localCheckpoint(false)
        }
        cur = (0 until k)
          .foldLeft(cur.join(means, Seq(fe), "left")) { (j, i) =>
            j.withColumn(s"__r_$i", col(s"__r_$i") - col("__n") * col(s"__mean_$i"))
          }
          .drop((0 until k).map(i => s"__mean_$i"): _*)
      }
      cur = cur.localCheckpoint(false)
      history += cur
      if (history.length >= 3)
        checkpointRdd(history.remove(0)).foreach(_.unpersist(false))
      converged = delta < tol * scale
    }

    // per-cell total effect Σ_f a_f = (sum − residual) / n, joined onto
    // facts by the full FE tuple. Materialize the small adjustment frame,
    // then free every intermediate.
    val adj = cur
      .select(
        fes.map(col) ++
          (0 until k).map(i => ((col(s"__s_$i") - col(s"__r_$i")) / col("__n")).as(s"__adj_$i")): _*)
      .localCheckpoint(false)
    adj.count()
    // materialize the per-FE effect tables BEFORE the means caches they
    // chain through are released
    val effTables = fes.map { fe =>
      val t = effAcc(fe)
        .select(
          col(fe) +: cols.zipWithIndex.map { case (c, i) => col(s"__acc_$i").as(s"eff_$c") }: _*)
        .localCheckpoint(false)
      t.count()
      t
    }
    history.foreach(d => checkpointRdd(d).foreach(_.unpersist(false)))
    meansHistory.foreach(_.unpersist(false))
    cells.unpersist(false)

    val joined = df.join(adj, fes, "left")
    val out = cols.zipWithIndex.foldLeft(joined) { case (acc, (c, i)) =>
      acc.withColumn(s"${c}__dm", col(c).cast("double") - col(s"__adj_$i"))
    }.drop((0 until k).map(i => s"__adj_$i"): _*)
    Demeaned(out, sweeps, Some(effTables))
  }

  /** Fit y ~ xs absorbing `fes`. The intercept is absorbed by the FEs.
    * `keep` names extra columns to carry through to the demeaned frame
    * (e.g. row keys for residual output) — everything else is projected
    * away before the iteration so the cell pass reads only what it must.
    */
  def fit(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 500,
      tol: Double = 1e-9,
      checkRank: Boolean = false,
      keep: Seq[String] = Nil,
      collectCellLimit: Long = 2000000L
  ): FeModel = {
    require(fes.nonEmpty, "use Ols.fit when there are no fixed effects")
    val needed = (fes ++ (y +: xs) ++ keep).distinct
    val d = demeanFull(df.select(needed.map(col): _*), y +: xs, fes, maxSweeps, tol, collectCellLimit)
    val ols =
      Ols.fit(d.frame, s"${y}__dm", xs.map(x => s"${x}__dm"), intercept = false, checkRank = checkRank)
    // map dropped/kept names back to the original x names
    val keptX = ols.xNames.map(n => n.stripSuffix("__dm"))
    FeModel(y, keptX, fes, ols.coef, ols.n, d.sweeps, ols, d.frame, d.effects)
  }

  /** Frequency-weighted fixed-effects fit: weighted alternating
    * projections (weighted group means via the same cell solvers) plus
    * a weighted Gram pass on the demeaned columns. With integer weights
    * this equals [[fit]] on the row-expanded data exactly (pinned by
    * spec) — which makes it the COMPRESSED-regression path: pre-
    * aggregate duplicate (y, xs, fes) rows to counts, then fit the
    * distinct rows weighted by count. Effect recovery goes through
    * [[FeModel.modelEffects]] (the effect tables are weighted); the
    * 1-FE closed form `effects` and `seClustered` assume unit weights.
    */
  def fitWeighted(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      fes: Seq[String],
      weight: String,
      maxSweeps: Int = 500,
      tol: Double = 1e-9,
      keep: Seq[String] = Nil
  ): FeModel = {
    require(fes.nonEmpty, "use Ols.fitWeighted when there are no fixed effects")
    val needed = (fes ++ (y +: xs) :+ weight) ++ keep
    val d = demeanFull(
      df.select(needed.distinct.map(col): _*), y +: xs, fes, maxSweeps, tol,
      weight = Some(weight))
    val ols = Ols.fitWeighted(
      d.frame, s"${y}__dm", xs.map(x => s"${x}__dm"), weight, intercept = false)
    FeModel(y, xs, fes, ols.coef, ols.n, d.sweeps, ols, d.frame, d.effects)
  }

  /** Multi-outcome fixed-effects fit — the reference's 2-D `y` in the
    * within regime (reference: hdfe.py:103-116 runs lstsq per outcome on
    * the same demeaned design). graft demeans ys ++ xs in ONE alternating
    * projection (the sweeps are identical regardless of how many columns
    * ride along) and shares ONE Gram pass across outcomes à la
    * [[Ols.fitMulti]]; only the k×k driver solves repeat per outcome.
    */
  def fitMulti(
      df: DataFrame,
      ys: Seq[String],
      xs: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 500,
      tol: Double = 1e-9,
      keep: Seq[String] = Nil
  ): Map[String, FeModel] = {
    require(fes.nonEmpty, "use Ols.fitMulti when there are no fixed effects")
    require(ys.nonEmpty, "need at least one outcome")
    val needed = (fes ++ ys ++ xs ++ keep).distinct
    val d =
      demeanFull(df.select(needed.map(col): _*), (ys ++ xs).distinct, fes, maxSweeps, tol)
    val models =
      Ols.fitMulti(d.frame, ys.map(y => s"${y}__dm"), xs.map(x => s"${x}__dm"), intercept = false)
    ys.map { y =>
      val m = models(s"${y}__dm")
      y -> FeModel(y, xs, fes, m.coef, m.n, d.sweeps, m, d.frame, d.effects)
    }.toMap
  }
}
