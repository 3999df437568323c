package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Scale shape per sweep and FE: one groupBy(fe).avg (map-side combined,
  * ≤ #groups rows move) + one join back (AQE broadcasts the small means
  * side, so the fact table is never shuffled when #groups is modest, and
  * co-partitions on the FE key when it is not). The OLS on the demeaned
  * columns is a single-pass Gram aggregation ([[Ols]]). No collect of
  * data rows anywhere.
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
    demeaned: DataFrame
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

  /** Cluster-robust covariance of the within estimator (scores use the
    * demeaned regressors; reference: hdfe.py:159-175).
    */
  def seClustered(cluster: String): Array[Double] =
    Ols.seClustered(demeaned, ols, s"${yName}__dm", cluster)
}

object FixedEffects {

  /** Demean `cols` within each of `fes` by alternating projections.
    * Returns the input frame with added `<col>__dm` columns and the
    * number of sweeps used. For a single FE one sweep is exact.
    */
  def demean(
      df: DataFrame,
      cols: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 60,
      tol: Double = 1e-8
  ): (DataFrame, Int) = {
    val dmCols = cols.map(c => s"${c}__dm")
    var cur = cols.foldLeft(df) { (acc, c) => acc.withColumn(s"${c}__dm", col(c).cast("double")) }

    val meanAggs = dmCols.map(c => avg(col(c)).as(s"__mean_$c"))

    /** Subtract per-group means of `fe`; `means` must be the groupBy(fe)
      * aggregate of the current frame. The means side is tiny (#groups
      * rows) — AQE broadcasts it, so the fact frame never shuffles.
      */
    def subtract(d: DataFrame, fe: String, means: DataFrame): DataFrame =
      dmCols
        .foldLeft(d.join(means, Seq(fe), "left")) { (j, c) =>
          j.withColumn(c, col(c) - col(s"__mean_$c"))
        }
        .drop(dmCols.map(c => s"__mean_$c"): _*)

    if (fes.length == 1) {
      val fe = fes.head
      val means = cur.groupBy(col(fe)).agg(meanAggs.head, meanAggs.tail: _*)
      return (subtract(cur, fe, means), 1)
    }

    // scale-aware tolerance: stop when the largest remaining group mean is
    // tol × the RMS of the original columns
    val rmsAggs = dmCols.map(c => sqrt(avg(col(c) * col(c))).as(c))
    val rmsRow = cur.agg(rmsAggs.head, rmsAggs.tail: _*).head()
    val scale = math.max((0 until dmCols.length).map(rmsRow.getDouble).max, 1e-300)

    // cached RDD behind a localCheckpoint'ed frame (to free superseded sweeps)
    def checkpointRdd(d: DataFrame) =
      d.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }

    var sweeps = 0
    var converged = false
    val history = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val meansHistory = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (!converged && sweeps < maxSweeps) {
      sweeps += 1
      var delta = 0.0
      for (fe <- fes) {
        // Materialize (persist) the tiny means frame: one pass over the
        // data. The convergence measure falls out of the SAME aggregate —
        // no separate probe passes over the fact table.
        val means = cur.groupBy(col(fe)).agg(meanAggs.head, meanAggs.tail: _*).persist()
        meansHistory += means
        val d = means
          .agg(greatest(dmCols.map(c => max(abs(col(s"__mean_$c")))): _*))
          .head()
          .getDouble(0)
        delta = math.max(delta, d)
        cur = subtract(cur, fe, means)
      }
      // LAZY localCheckpoint at the sweep boundary: the logical plan is
      // truncated to an RDD scan immediately (Catalyst never re-optimizes
      // a growing join chain), while materialization happens as a side
      // effect of the NEXT sweep's first means pass — no dedicated
      // checkpoint job per sweep.
      cur = cur.localCheckpoint(false)
      history += cur
      // sweep k's checkpoint is only an input to sweep k+1's; anything
      // older is dead weight in the block manager — free it.
      if (history.length >= 3)
        checkpointRdd(history.remove(0)).foreach(_.unpersist(false))
      converged = delta < tol * scale
    }
    // materialize the final frame, then release every intermediate cache
    cur.count()
    history.dropRight(1).foreach(d => checkpointRdd(d).foreach(_.unpersist(false)))
    meansHistory.foreach(_.unpersist(false))
    (cur, sweeps)
  }

  /** Fit y ~ xs absorbing `fes`. The intercept is absorbed by the FEs.
    * `keep` names extra columns to carry through to the demeaned frame
    * (e.g. row keys for residual output) — everything else is projected
    * away before the iteration so sweeps move only what they must.
    */
  def fit(
      df: DataFrame,
      y: String,
      xs: Seq[String],
      fes: Seq[String],
      maxSweeps: Int = 60,
      tol: Double = 1e-8,
      checkRank: Boolean = false,
      keep: Seq[String] = Nil
  ): FeModel = {
    require(fes.nonEmpty, "use Ols.fit when there are no fixed effects")
    val needed = (fes ++ (y +: xs) ++ keep).distinct
    val (dm, sweeps) = demean(df.select(needed.map(col): _*), y +: xs, fes, maxSweeps, tol)
    val ols =
      Ols.fit(dm, s"${y}__dm", xs.map(x => s"${x}__dm"), intercept = false, checkRank = checkRank)
    // map dropped/kept names back to the original x names
    val keptX = ols.xNames.map(n => n.stripSuffix("__dm"))
    FeModel(y, keptX, fes, ols.coef, ols.n, sweeps, ols, dm)
  }
}
