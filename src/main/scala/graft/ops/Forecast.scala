package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additive Holt–Winters (triple exponential smoothing; Winters 1960)
  * per key — the FORECASTING member of the time-series family:
  * [[Ewma]] smooths, [[Seasonal]] decomposes retrospectively,
  * [[Changepoint]] alarms, this extrapolates level + trend + season
  * `horizon` steps ahead and scores in-sample one-step-ahead fits:
  *
  *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
  *   b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
  *   s_t = γ(y_t − l_t) + (1−γ) s_{t−m}
  *
  * The recursion is inherently sequential per key, so it runs as ONE
  * `flatMapGroups` fold over each key's rows sorted by time — the
  * [[graft.streaming.EventStream.ewmaStream]] shape and contract: a
  * key's series fits one executor (time-cardinality rows, not corpus
  * rows; a 10-year daily series is 3,650 doubles). Keys parallelize;
  * nothing global.
  *
  * Initialization is the textbook two-season scheme: s = first-season
  * deviations from its mean, l = first-season mean, b = (second-season
  * mean − first)/m; series shorter than 2m are emitted with null
  * outputs (flagged, not failed). 6dp floor-quantized outputs.
  */
object Forecast {

  def holtWinters(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCol: String,
      period: Int,
      alpha: Double = 0.3,
      beta: Double = 0.1,
      gamma: Double = 0.2,
      horizon: Int = 0): DataFrame = {
    require(period >= 2, "period must be >= 2")
    require(horizon >= 0, "horizon must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

    val typed = df.select(
      col(keyCol).cast("string").as("k"),
      col(timeCol).cast("long").as("t"),
      col(valueCol).cast("double").as("v"))
      .as[(String, Long, Double)]

    val out = typed
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        val n = rows.length
        if (n < 2 * period) {
          // too short to initialize: flagged rows, no forecasts
          rows.iterator.map(r =>
            (key, r._2, Option(r._3), None: Option[Double], None: Option[Double],
              None: Option[Double], None: Option[Double], false))
        } else {
          val y = rows.map(_._3)
          val m = period
          val mean1 = y.take(m).sum / m
          val mean2 = y.slice(m, 2 * m).sum / m
          val s = Array.tabulate(m)(i => y(i) - mean1)
          var l = mean1
          var b = (mean2 - mean1) / m
          val res = Array.newBuilder[(String, Long, Option[Double], Option[Double],
            Option[Double], Option[Double], Option[Double], Boolean)]
          var i = 0
          while (i < n) {
            if (i < m) {
              res += ((key, rows(i)._2, Some(y(i)), None, None, Some(q6(s(i))), None, false))
            } else {
              val sPrev = s(i % m)
              val fitted = l + b + sPrev
              val lPrev = l
              l = alpha * (y(i) - sPrev) + (1 - alpha) * (l + b)
              b = beta * (l - lPrev) + (1 - beta) * b
              s(i % m) = gamma * (y(i) - l) + (1 - gamma) * sPrev
              res += ((key, rows(i)._2, Some(y(i)), Some(q6(l)), Some(q6(b)),
                Some(q6(s(i % m))), Some(q6(fitted)), false))
            }
            i += 1
          }
          // forecasts extend the OBSERVED time index by its last spacing
          // of 1 (integer steps, the dailySeries convention)
          val lastT = rows(n - 1)._2
          for (j <- 1 to horizon) {
            val sj = s((n - 1 + j) % m)
            res += ((key, lastT + j, None, None, None, Some(q6(sj)),
              Some(q6(l + j * b + sj)), true))
          }
          res.result().iterator
        }
      }
      .toDF("k", "t", "v", "level", "trend", "seasonal", "fitted", "is_forecast")
    out
      .withColumnRenamed("k", keyCol)
      .withColumnRenamed("t", timeCol)
      .withColumnRenamed("v", valueCol)
  }

  /** Per-key AR(1) fit + 3-step forecast, fully closed-form: one keyed
    * lag window pairs (y_t, y_{t−1}), φ and the intercept come from the
    * per-key 5-moment lag regression, and the forecasts unroll as
    * f₁ = c + φ·y_T, f₂ = c + φ·f₁, f₃ = c + φ·f₂ — nested literals,
    * no geometric-sum division, so there is NOTHING iterative to
    * replay. The cheap "is tomorrow like today" per-entity baseline
    * beside the seasonal [[holtWinters]] (which earns its keep only at
    * period-structure). Keys with < 3 lag pairs or zero lag variance
    * return null fit columns. Returns one row per key: n_pairs, phi,
    * icept, y_last, f1, f2, f3 (6dp).
    */
  def ar1(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      valueCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"), col(tieCol).as("tb"),
      col(valueCol).cast("double").as("y"))
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("rn_desc", row_number().over(
        Window.partitionBy("k").orderBy(col("t").desc, col("tb").desc)))
    val m = base.groupBy("k").agg(
      sum(when(col("y1").isNotNull, lit(1)).otherwise(lit(0))).as("np"),
      sum(when(col("y1").isNotNull, col("y"))).as("sy"),
      sum(when(col("y1").isNotNull, col("y1"))).as("sa"),
      sum(when(col("y1").isNotNull, col("y") * col("y1"))).as("sya"),
      sum(when(col("y1").isNotNull, col("y1") * col("y1"))).as("saa"),
      max(when(col("rn_desc") === 1, col("y"))).as("y_last"))
    // multiplied (division-free) variance form so the ok-predicate never
    // divides by a zero pair count under ANSI
    val dxx = col("np").cast("double") * col("saa") - col("sa") * col("sa")
    val ok = col("np") >= 3 && dxx > 0
    val phi = (col("np").cast("double") * col("sya") - col("sy") * col("sa")) / dxx
    val c0 = (col("sy") - phi * col("sa")) / col("np").cast("double")
    val f1 = c0 + phi * col("y_last")
    val f2 = c0 + phi * f1
    val f3 = c0 + phi * f2
    m.select(
      col("k").as(keyCol),
      col("np").cast("long").as("n_pairs"),
      when(ok, q6(phi)).as("phi"),
      when(ok, q6(c0)).as("icept"),
      col("y_last"),
      when(ok, q6(f1)).as("f1"),
      when(ok, q6(f2)).as("f2"),
      when(ok, q6(f3)).as("f3"))
  }

  /** Per-key forecast scorecard against a prediction column: MAE,
    * RMSE, MAPE (zero-actual rows EXCLUDED and counted — the honest
    * MAPE convention), sMAPE (zero-denominator rows likewise), and
    * MASE scaled by the in-sample naive |Δy| (one keyed lag — rows
    * with no lag don't enter the scale). Rows with null predictions
    * are excluded and counted (`n_unscored`). One keyed window + one
    * keyed aggregate; every ratio a closed form. MASE null when the
    * naive scale is 0 (constant series).
    */
  def accuracy(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieCol: String,
      actualCol: String,
      predCol: String): DataFrame = {
    def q6(c: Column) = floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val base = df.select(
      col(keyCol).as("k"), col(timeCol).as("t"), col(tieCol).as("tb"),
      col(actualCol).cast("double").as("y"), col(predCol).cast("double").as("p"))
      .withColumn("y1", lag("y", 1).over(w))
    val scored = col("p").isNotNull
    val e = col("y") - col("p")
    val m = base.groupBy("k").agg(
      count(lit(1)).as("n"),
      sum(when(scored, 1).otherwise(0)).as("ns"),
      sum(when(scored, abs(e))).as("sae"),
      sum(when(scored, e * e)).as("sse"),
      sum(when(scored && col("y") =!= 0.0, abs(e) / abs(col("y")))).as("sape"),
      sum(when(scored && col("y") =!= 0.0, 1).otherwise(0)).as("nape"),
      sum(when(scored && abs(col("y")) + abs(col("p")) > 0.0,
        abs(e) / ((abs(col("y")) + abs(col("p"))) / lit(2.0)))).as("ssm"),
      sum(when(scored && abs(col("y")) + abs(col("p")) > 0.0, 1).otherwise(0)).as("nsm"),
      sum(when(col("y1").isNotNull, abs(col("y") - col("y1")))).as("snaive"),
      sum(when(col("y1").isNotNull, 1).otherwise(0)).as("nnaive"))
    m.select(
      col("k").as(keyCol),
      col("n").cast("long").as("n"),
      col("ns").cast("long").as("n_scored"),
      (col("n") - col("ns")).cast("long").as("n_unscored"),
      when(col("ns") > 0, q6(col("sae") / col("ns").cast("double"))).as("mae"),
      when(col("ns") > 0, q6(sqrt(col("sse") / col("ns").cast("double")))).as("rmse"),
      when(col("nape") > 0, q6(col("sape") / col("nape").cast("double"))).as("mape"),
      when(col("nsm") > 0, q6(col("ssm") / col("nsm").cast("double"))).as("smape"),
      when(col("ns") > 0 && col("nnaive") > 0 && col("snaive") > 0,
        q6((col("sae") / col("ns").cast("double")) /
          (col("snaive") / col("nnaive").cast("double")))).as("mase"))
  }
}
