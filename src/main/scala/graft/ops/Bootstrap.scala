package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** One-pass Poisson bootstrap for grouped statistics. The classic
  * resampling bootstrap is unusable at 100 TB (B shuffled copies of the
  * corpus); the Poisson approximation (Chamandy et al., "Estimating
  * Uncertainty for Massive Data Streams", Google 2012) replaces each
  * replicate's multinomial row counts with independent Poisson(1)
  * weights, so ALL B replicates ride ONE corpus pass: each row computes
  * its B weights from a deterministic hash of (id, replicate) and the
  * aggregate carries 2B sums per group (Σ w·y and Σ w). No data copy,
  * no extra shuffle beyond the one groupBy.
  *
  * Weights are drawn by inverting the Poisson(1) CDF on a uniform built
  * from [[SharedHash.md5Long60]] — the same hash DuckDB computes, so the
  * oracle replays every draw bit-for-bit. The CDF is truncated at k=4
  * (mass beyond: 0.37%; the truncation is part of the operator's
  * definition, applied identically in both engines).
  */
object Bootstrap {

  /** P(K <= k) for Poisson(1), k = 0..3; a uniform above the last entry
    * draws the truncation cap 4.
    */
  private val cdf = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058, 0.9810118431238462)
  private val Two60 = math.pow(2.0, 60)

  /** The replicate-r Poisson(1) weight for the row identified by `id`. */
  def weight(id: Column, r: Int): Column = {
    val u = SharedHash.md5Long60(concat(id.cast("string"), lit(s"#$r"))).cast("double") / lit(Two60)
    cdf.indices.foldRight(lit(4): Column) { (k, elseC) => when(u < cdf(k), lit(k)).otherwise(elseC) }
  }

  /** The same draw in DuckDB SQL, for oracle construction. */
  def weightSql(idExpr: String, r: Int): String =
    weightSqlRep(idExpr, r.toString)

  /** [[weightSql]] with the replicate index as a SQL expression (e.g. a
    * column from an unnested `range(b)`), so one CASE covers all b
    * replicates in the oracle.
    */
  def weightSqlRep(idExpr: String, repExpr: String): String = {
    val u = s"${SharedHash.md5Long60Sql(s"$idExpr || '#' || ($repExpr)::VARCHAR")}::DOUBLE / ${Two60.toLong}.0"
    s"(CASE WHEN $u < ${cdf(0)} THEN 0 WHEN $u < ${cdf(1)} THEN 1 WHEN $u < ${cdf(2)} THEN 2 WHEN $u < ${cdf(3)} THEN 3 ELSE 4 END)"
  }

  /** Pairs-CLUSTER Poisson bootstrap of a simple-OLS slope: replicate
    * weights are drawn per CLUSTER (every row of a cluster shares its
    * draw — the resampling unit is the cluster, the design-based
    * analogue of [[graft.ml.Ols.varianceClustered]]), and ALL B
    * replicate regressions ride ONE aggregate pass: 5 weighted sums per
    * replicate (Σw, Σwx, Σwy, Σwx², Σwxy), each slope a closed form on
    * its 5 sums. At 100 TB this is B bootstrap regressions for the
    * price of one corpus scan — the resampled-copies formulation is
    * B full shuffles.
    */
  def olsSlopeSE(
      df: DataFrame,
      y: String,
      x: String,
      clusterCol: String,
      b: Int = 32
  ): DataFrame = {
    val xc = col(x).cast("double"); val yc = col(y).cast("double")
    val weighted = (0 until b).foldLeft(df) { (d, r) =>
      d.withColumn(s"__w$r", weight(col(clusterCol).cast("string"), r).cast("double"))
    }
    val aggs =
      Seq(count(lit(1)).as("n"),
        sum(xc).as("sx"), sum(yc).as("sy"), sum(xc * xc).as("sxx"), sum(xc * yc).as("sxy")) ++
        (0 until b).flatMap { r =>
          val w = col(s"__w$r")
          Seq(sum(w).as(s"w$r"), sum(w * xc).as(s"wx$r"), sum(w * yc).as(s"wy$r"),
            sum(w * xc * xc).as(s"wxx$r"), sum(w * xc * yc).as(s"wxy$r"))
        }
    val g = weighted.agg(aggs.head, aggs.tail: _*)

    def slopeOf(w: Column, sx: Column, sy: Column, sxx: Column, sxy: Column): Column =
      (w * sxy - sx * sy) / (w * sxx - sx * sx)
    val slopes = (0 until b).map { r =>
      slopeOf(col(s"w$r"), col(s"wx$r"), col(s"wy$r"), col(s"wxx$r"), col(s"wxy$r"))
    }
    val sbar = slopes.reduce(_ + _) / b.toDouble
    val sumSq = slopes.map(s => s * s).reduce(_ + _)
    g.select(
      col("n").cast("long").as("n"),
      round(slopeOf(col("n").cast("double"), col("sx"), col("sy"), col("sxx"), col("sxy")), 4)
        .as("slope"),
      round(sqrt((sumSq - lit(b.toDouble) * sbar * sbar) / lit((b - 1).toDouble)), 4)
        .as("boot_se_cluster"))
  }

  /** Per-group mean of `valueCol` with its Poisson-bootstrap standard
    * error over `b` replicates. One aggregate pass carrying 2b+2 sums
    * per group; the replicate means and their spread are closed forms on
    * those sums (SE via Σm² − B·m̄² — every m is O(mean)-scaled so the
    * subtraction is well-conditioned). `idCol` must be row-unique (it
    * seeds the draws).
    */
  def groupedMeanSE(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      idCol: Column,
      b: Int = 32
  ): DataFrame = {
    val y = col(valueCol).cast("double")
    val weighted = (0 until b).foldLeft(df.withColumn("__y", y)) { (d, r) =>
      d.withColumn(s"__w$r", weight(idCol, r).cast("double"))
    }
    val aggs =
      Seq(count(lit(1)).as("n"), avg(col("__y")).as("mean")) ++
        (0 until b).flatMap { r =>
          Seq(sum(col(s"__w$r") * col("__y")).as(s"wy$r"), sum(col(s"__w$r")).as(s"w$r"))
        }
    val grouped = weighted.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)

    val means = (0 until b).map(r => col(s"wy$r") / col(s"w$r"))
    val mbar = means.reduce(_ + _) / b.toDouble
    val sumSq = means.map(m => m * m).reduce(_ + _)
    grouped.select(
      col(groupCol),
      col("n").cast("long").as("n"),
      round(col("mean"), 4).as("mean"),
      round(sqrt((sumSq - lit(b.toDouble) * mbar * mbar) / lit((b - 1).toDouble)), 4).as("boot_se"))
  }
}
