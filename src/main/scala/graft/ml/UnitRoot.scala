package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dickey–Fuller unit-root test (Dickey & Fuller 1979), constant-only
  * form — "is this series a random walk or mean-reverting?", the
  * stationarity gate in front of the AR/forecast family
  * ([[graft.ops.Forecast]], q286 AR(1)): regress Δy_t on (1, y_{t−1})
  * and read the t-statistic of the lag coefficient against the
  * DF distribution (NOT the usual t table — under the unit-root null
  * the statistic is left-shifted; the asymptotic 5% critical value for
  * the constant-only case is −2.8621, MacKinnon 2010, shipped as a
  * documented constant).
  *
  * Scale shape: the lag pairs come from ONE equi-join of the series on
  * key = t−1 (shuffle on the time key — never a single-partition
  * window), then one moment aggregate; slope/intercept/SE are Cramer
  * closed forms on the driver. The input is typically an
  * already-aggregated (bucket, value) series — bucket upstream.
  */
object UnitRoot {

  /** MacKinnon (2010) asymptotic 5% critical value, constant, no trend. */
  val Crit5ConstOnly: Double = -2.8621

  final case class Result(
      rho: Double, // coefficient on y_{t−1}
      tStat: Double,
      alpha: Double, // drift
      nObs: Long, // differenced observations
      reject5pct: Boolean)

  /** `tCol` must be an integer-like bucket index (consecutive values
    * one step apart form the lag pairs; gaps simply contribute no
    * pair — document the bucketing upstream).
    */
  def dickeyFuller(df: DataFrame, tCol: String, valueCol: String): Result = {
    val cur = df.select(col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("y"))
    val prev = df.select((col(tCol).cast("long") + 1L).as("t"),
      col(valueCol).cast("double").as("ylag"))
    val pairs = cur.join(prev, Seq("t"))
      .select((col("y") - col("ylag")).as("d"), col("ylag").as("x"))
    val r = pairs.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("sx"), sum(col("d")).as("sd"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("d")).as("sxd"),
      sum(col("d") * col("d")).as("sdd")).head()
    val n = r.getAs[Double]("n")
    require(n >= 4, s"UnitRoot.dickeyFuller: need >= 4 lag pairs, got ${n.toLong}")
    val sx = r.getAs[Double]("sx"); val sd = r.getAs[Double]("sd")
    val sxx = r.getAs[Double]("sxx"); val sxd = r.getAs[Double]("sxd")
    val sdd = r.getAs[Double]("sdd")
    val det = n * sxx - sx * sx
    require(det > 0, "UnitRoot.dickeyFuller: lagged series is constant")
    val rho = (n * sxd - sx * sd) / det
    val a = (sd - rho * sx) / n
    val ssr = sdd - a * sd - rho * sxd
    val s2 = math.max(ssr, 0.0) / (n - 2.0)
    val se = math.sqrt(s2 * n / det)
    val t = rho / se
    Result(rho, t, a, math.round(n), t < Crit5ConstOnly)
  }

  /** One-row summary frame (6dp floor-quantized). */
  def summary(spark: org.apache.spark.sql.SparkSession, r: Result): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(r.rho), q6(r.tStat), q6(r.alpha), r.nObs, Crit5ConstOnly,
      if (r.reject5pct) 1 else 0))
      .toDF("rho", "t_stat", "drift", "n_obs", "crit_5pct", "reject_5pct")
  }

  /** KPSS (1992) level-stationarity asymptotic 5% critical value. */
  val KpssCrit5Level: Double = 0.463

  /** KPSS level-stationarity test — the COMPLEMENT of [[dickeyFuller]]
    * (null flipped: DF's null is a unit root, KPSS's null is
    * stationarity; agreeing verdicts from both is the standard
    * pre-forecast certificate): η = Σ S_t²/(n²·σ̂²_LR) with S_t the
    * demeaned partial sums and σ̂²_LR the Bartlett-weighted long-run
    * variance with an EXPLICIT lag budget (never silently derived).
    *
    * Scale shape: one mean aggregate, ONE distributed prefix pass for
    * the partial sums ([[graft.ops.Rank.withPrefixSums]] — never a
    * single-partition window), the γ_l autocovariances from one
    * self-join per lag on t−l (gaps contribute no pair, the
    * [[dickeyFuller]] convention), one moment aggregate.
    */
  final case class KpssResult(
      stat: Double,
      sigma2Lr: Double,
      nObs: Long,
      lags: Int,
      reject5pct: Boolean)

  def kpss(df: DataFrame, tCol: String, valueCol: String, lags: Int = 4): KpssResult = {
    require(lags >= 0, "UnitRoot.kpss: lags must be >= 0")
    val base = df.select(col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("y"))
      .localCheckpoint(true)
    val mRow = base.agg(count(lit(1)).cast("double"), sum(col("y"))).head()
    val n = mRow.getDouble(0)
    require(n >= lags + 2, s"UnitRoot.kpss: need more than lags+1 rows, got ${n.toLong}")
    val ybar = mRow.getDouble(1) / n
    val e = base.withColumn("e", col("y") - lit(ybar))
    val cum = graft.ops.Rank.withPrefixSums(e, Seq(col("t")), Seq("e"))
    val r0 = cum.agg(
      sum(col("__cum_e") * col("__cum_e")).as("ss"),
      sum(col("e") * col("e")).as("g0")).head()
    val sSq = r0.getAs[Double]("ss")
    val gamma0 = r0.getAs[Double]("g0") / n
    var sigma2 = gamma0
    for (l <- 1 to lags) {
      val lagged = e.select((col("t") + l).as("t"), col("e").as("elag"))
      val gl = e.join(lagged, Seq("t"))
        .agg(coalesce(sum(col("e") * col("elag")), lit(0.0))).head().getDouble(0) / n
      sigma2 += 2.0 * (1.0 - l.toDouble / (lags + 1.0)) * gl
    }
    // a constant series gives sigma2 = 0 and a 0/0 = NaN statistic whose
    // reject5pct would silently read false — fail like dickeyFuller does
    require(sigma2 > 0,
      "UnitRoot.kpss: series has no variation (long-run variance is zero)")
    val stat = sSq / (n * n * sigma2)
    KpssResult(stat, sigma2, math.round(n), lags, stat > KpssCrit5Level)
  }

  /** One-row KPSS summary (6dp floor-quantized). */
  def kpssSummary(spark: org.apache.spark.sql.SparkSession, r: KpssResult): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(r.stat), q6(r.sigma2Lr), r.nObs, r.lags, KpssCrit5Level,
      if (r.reject5pct) 1 else 0))
      .toDF("kpss_stat", "sigma2_lr", "n_obs", "lags", "crit_5pct", "reject_5pct")
  }

  final case class LjungBoxResult(
      qStat: Double,
      lags: Int,
      nObs: Long,
      pValue: Double,
      reject5pct: Boolean)

  /** Ljung–Box white-noise portmanteau test (Ljung & Box 1978) — "do
    * the first h autocorrelations of this series look like noise?",
    * the residual-diagnostic companion of [[dickeyFuller]]/[[kpss]]
    * (run it on a forecast model's residuals; a rejection means
    * structure the model missed): Q = n(n+2)·Σ_{k≤h} r̂²_k/(n−k) with
    * r̂_k the demeaned lag-k autocorrelation, compared to χ²(h) via
    * [[graft.functions.NormalDist.chiSqUpperTail]].
    *
    * Scale shape: one mean aggregate, then ONE t−k equi-join per lag
    * (the [[kpss]] Bartlett convention — gaps contribute no pair,
    * shuffles only on the time key), each reduced to a single moment;
    * h is an explicit small budget, never derived from n.
    */
  def ljungBox(df: DataFrame, tCol: String, valueCol: String, lags: Int = 6): LjungBoxResult = {
    require(lags >= 1, "UnitRoot.ljungBox: lags must be >= 1")
    val base = df.select(col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("y"))
      .localCheckpoint(true)
    val mRow = base.agg(count(lit(1)).cast("double"), sum(col("y"))).head()
    val n = mRow.getDouble(0)
    require(n >= lags + 2, s"UnitRoot.ljungBox: need more than lags+1 rows, got ${n.toLong}")
    val ybar = mRow.getDouble(1) / n
    val e = base.withColumn("e", col("y") - lit(ybar))
    val g0 = e.agg(sum(col("e") * col("e"))).head().getDouble(0)
    require(g0 > 0, "UnitRoot.ljungBox: series has no variation")
    var q = 0.0
    for (k <- 1 to lags) {
      val lagged = e.select((col("t") + k).as("t"), col("e").as("elag"))
      val gk = e.join(lagged, Seq("t"))
        .agg(coalesce(sum(col("e") * col("elag")), lit(0.0))).head().getDouble(0)
      val r = gk / g0
      q += r * r / (n - k)
    }
    val stat = n * (n + 2.0) * q
    val p = graft.functions.NormalDist.chiSqUpperTail(stat, lags)
    LjungBoxResult(stat, lags, math.round(n), p, p < 0.05)
  }

  /** One-row Ljung–Box summary (6dp floor-quantized). */
  def ljungBoxSummary(spark: org.apache.spark.sql.SparkSession, r: LjungBoxResult): DataFrame = {
    import spark.implicits._
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    Seq((q6(r.qStat), r.lags, r.nObs, q6(r.pValue), if (r.reject5pct) 1 else 0))
      .toDF("q_stat", "lags", "n_obs", "p_value", "reject_5pct")
  }
}
