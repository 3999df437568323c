package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chamberlain (1980) conditional fixed-effects logit for PAIRED
  * panels (T = 2) — the estimator [[Glm.fitFE]] deliberately refuses
  * to fake (its doc: absorbed logit hits the incidental-parameters
  * problem; the group intercepts do NOT profile out of a logit the way
  * they demean out of a linear model). Conditioning on the within-group
  * success count removes the group effect EXACTLY, and for two-period
  * groups the conditional likelihood collapses to a beautiful closed
  * form: concordant pairs ((0,0) or (1,1)) carry no information and
  * drop; each discordant pair contributes
  * P(first obs is the 1 | one success) = logistic((x₁ − x₂)'β) — a
  * plain NO-INTERCEPT logit on within-pair covariate differences.
  *
  * Scale shape: one groupBy to find two-row groups and split them
  * deterministically (min_by/max_by on the struct (orderCol, y, x…) —
  * ties on `orderCol` alone fall through to the values, so the split
  * is total even on a non-unique order column; rows identical in
  * EVERY column cannot be discordant, so orientation never matters),
  * one row-local differencing, then the [[Glm.logistic]] IRLS
  * (intercept = false) over the discordant pairs only — the corpus
  * never moves twice.
  */
object CondLogit {

  case class Model(
      xNames: Seq[String],
      coef: Array[Double],
      nPairs: Long,
      nDiscordant: Long,
      iters: Int,
      converged: Boolean,
      deviance: Double)

  def fitPaired(
      df: DataFrame,
      yCol: String,
      xCols: Seq[String],
      groupCol: String,
      orderCol: String,
      tol: Double = 1e-9,
      maxIter: Int = 30): Model = {
    val base = df.select(
      (col(groupCol).as("__g") +: col(orderCol).as("__o") +:
        col(yCol).cast("double").as("__y") +:
        xCols.map(c => col(c).cast("double").as(c))): _*)
    val payload = struct((col("__y") +: xCols.map(col)): _*)
    val orderKey = struct((col("__o") +: col("__y") +: xCols.map(col)): _*)
    val pairs = base
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).as("__cnt"),
        min_by(payload, orderKey).as("__a"),
        max_by(payload, orderKey).as("__b"))
      .where(col("__cnt") === 2)
      .localCheckpoint(true) // read twice: counts + the fit
    val nPairs = pairs.count()
    require(nPairs > 0, "CondLogit.fitPaired: no two-observation groups")
    val disc = pairs
      .where(col("__a.__y") =!= col("__b.__y"))
      .select(
        (col("__a.__y").as("__z") +:
          xCols.map(c => (col(s"__a.$c") - col(s"__b.$c")).as(s"__d_$c"))): _*)
      .localCheckpoint(true)
    // guard BEFORE the IRLS: an empty/thin discordant set would die
    // inside the fit with an opaque runtime error
    require(disc.count() > xCols.length,
      "CondLogit.fitPaired: not enough discordant pairs to identify the slopes")
    val m = Glm.logistic(disc, "__z", xCols.map(c => s"__d_$c"),
      intercept = false, tol = tol, maxIter = maxIter)
    Model(xCols, m.coef, nPairs, m.n, m.iters, m.converged, m.deviance)
  }

  /** One-row summary: per-covariate coefficients at 4dp plus the mean
    * per-pair deviance (the SUM's cross-engine summation-order noise
    * would thin a fixed-decimals margin at scale — the C115 lesson).
    */
  def summary(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    def q4(v: Double) = math.floor(v * 1e4 + 0.5) / 1e4
    m.xNames.indices.map { i =>
      (m.xNames(i), q4(m.coef(i)), q4(m.deviance / m.nDiscordant),
        m.nPairs, m.nDiscordant, m.iters, if (m.converged) 1 else 0)
    }.toDF("name", "coef", "dev_avg", "n_pairs", "n_discordant", "iters", "converged")
  }
}
