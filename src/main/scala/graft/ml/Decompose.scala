package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oaxaca–Blinder decomposition (Oaxaca 1973; Blinder 1973) — splits a
  * two-group mean-outcome gap into the part explained by covariate
  * composition and the residual "structure" part (coefficients +
  * intercept), the standard wage-gap / cohort-mix diagnostic. Simple
  * (one-regressor) form with group B as the reference structure:
  *
  *   ȳA − ȳB = βB·(x̄A − x̄B)  [explained]
  *           + (αA − αB) + x̄A·(βA − βB)  [unexplained]
  *
  * One conditional-sum aggregate pass computes both groups' five
  * moments; slopes/intercepts are the OLS closed forms over those
  * moments — 2-row-sized driver arithmetic, fully replayable in SQL.
  */
object Decompose {

  def oaxaca(
      df: DataFrame,
      groupCol: String,
      groupA: String,
      groupB: String,
      yCol: String,
      xCol: String): DataFrame = {
    val g = col(groupCol)
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def side(v: String, c: org.apache.spark.sql.Column) = sum(when(g === v, c))
    val agg = df
      .where(g.isin(groupA, groupB))
      .agg(
        side(groupA, lit(1.0)).as("na"), side(groupA, x).as("sxa"),
        side(groupA, y).as("sya"), side(groupA, x * x).as("sxxa"),
        side(groupA, x * y).as("sxya"),
        side(groupB, lit(1.0)).as("nb"), side(groupB, x).as("sxb"),
        side(groupB, y).as("syb"), side(groupB, x * x).as("sxxb"),
        side(groupB, x * y).as("sxyb"))
    val mxa = col("sxa") / col("na"); val mya = col("sya") / col("na")
    val mxb = col("sxb") / col("nb"); val myb = col("syb") / col("nb")
    val ba = (col("sxya") - col("na") * mxa * mya) / (col("sxxa") - col("na") * mxa * mxa)
    val bb = (col("sxyb") - col("nb") * mxb * myb) / (col("sxxb") - col("nb") * mxb * mxb)
    val aa = mya - ba * mxa
    val ab = myb - bb * mxb
    val gap = mya - myb
    val explained = bb * (mxa - mxb)
    val unexplained = (aa - ab) + mxa * (ba - bb)
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("double") / lit(1e6)
    agg.select(
      col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      q6(gap).as("gap"),
      q6(explained).as("explained"),
      q6(unexplained).as("unexplained"),
      q6(ba).as("beta_a"),
      q6(bb).as("beta_b"))
  }

  /** Baron–Kenny mediation with the Sobel test (Baron & Kenny 1986;
    * Sobel 1982): how much of x's effect on y routes through mediator
    * m? a-path slope (m ~ x), b-path and direct c′ from (y ~ x + m),
    * indirect effect a·b with Sobel z = a·b/√(a²·se_b² + b²·se_a²).
    * Two [[Ols]] Gram passes, driver closed forms — same cost as two
    * plain regressions.
    */
  def mediation(
      df: DataFrame,
      xCol: String,
      mCol: String,
      yCol: String,
      dp: Int = 4): DataFrame = {
    val fa = Ols.fit(df, mCol, Seq(xCol))
    val fb = Ols.fit(df, yCol, Seq(xCol, mCol))
    val a = fa.coef(1); val seA = fa.seHomoskedastic(1)
    val cPrime = fb.coef(1)
    val b = fb.coef(2); val seB = fb.seHomoskedastic(2)
    val indirect = a * b
    val sobel = indirect / math.sqrt(a * a * seB * seB + b * b * seA * seA)
    val spark = df.sparkSession
    import spark.implicits._
    val scale = math.pow(10, dp)
    def q(x: Double) = math.floor(x * scale + 0.5) / scale
    Seq((fa.n, q(a), q(b), q(cPrime), q(indirect), q(sobel)))
      .toDF("n", "a_path", "b_path", "direct", "indirect", "sobel_z")
  }
}
