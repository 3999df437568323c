package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Papadopoulos 2002; Lei et al.
  * 2018) — distribution-free finite-sample coverage on top of ANY point
  * model: fit on a training split, take the ⌈(1−α)(n+1)⌉-th smallest
  * absolute calibration residual as the half-width q, and
  * [ŷ − q, ŷ + q] covers new points with probability ≥ 1−α. The honest
  * uncertainty companion to the engine's point regressions.
  *
  * Scale shape: one [[Ols.fit]] Gram pass on the train split, one
  * residual scan + one exact order-statistic selection on the
  * calibration split (a sort of calibration-sized data — swap in an
  * approximate quantile at petabyte calibration sizes), then interval
  * construction is row-local. The split is `id % 2` — deterministic and
  * replayable on any engine, no RNG.
  */
object Conformal {

  /** Per-row intervals for the `id % emitEvery == emitResidue` sample
    * (keep the dump bounded; pass 1/0 to emit everything). Coverage is
    * the RATIONAL covNum/covDen (9/10 = 90%) so the order-statistic
    * rank ⌈(covNum/covDen)·(n+1)⌉ is computed in exact integer
    * arithmetic — ceil(0.9·(n+1)) in binary64 lands on the wrong side
    * of the integer for many n. Output: id, pred, lo, hi (2dp/cents —
    * coefficient solve noise is ~1e-10 relative, margins probed at
    * sf0.01).
    */
  def splitIntervals(
      df: DataFrame,
      idCol: String,
      yCol: String,
      xCols: Seq[String],
      covNum: Long = 9L,
      covDen: Long = 10L,
      emitEvery: Long = 25L,
      emitResidue: Long = 0L): DataFrame = {
    val base = df.select(
      (col(idCol).cast("long").as("id") +: col(yCol).cast("double").as("__y") +:
        xCols.map(c => col(c).cast("double").as(c))): _*)
      .localCheckpoint(true)
    val train = base.where(col("id") % 2 === 0)
    val cal = base.where(col("id") % 2 === 1)
    val m = Ols.fit(train, "__y", xCols)
    val pred = Ols.fittedCol(m)

    val resid = cal.select(col("id"), abs(col("__y") - pred).as("r"))
    val nCal = resid.count()
    require(nCal > 0, "Conformal.splitIntervals: empty calibration split")
    val rank = math.min((covNum * (nCal + 1) + covDen - 1) / covDen, nCal)
    // rank selection via the distributed global row number (exact, no
    // single-partition WindowExec) — the calibration split is HALF the
    // input, corpus-sized by construction
    val q = graft.ops.Rank
      .withGlobalRowNumber(resid, "rn", Seq(col("r"), col("id")))
      .where(col("rn") === rank)
      .head().getAs[Double]("r")

    def r2(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e2) + lit(0.5)).cast("double") / lit(1e2)
    base
      .where(col("id") % emitEvery === emitResidue)
      .select(
        col("id"),
        r2(pred).as("pred"),
        r2(pred - q).as("lo"),
        r2(pred + q).as("hi"))
  }
}
