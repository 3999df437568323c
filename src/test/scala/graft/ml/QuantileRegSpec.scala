package graft.ml

import graft.SparkSpec

class QuantileRegSpec extends SparkSpec {
  import spark.implicits._

  // heteroskedastic design with ANALYTIC conditional quantiles:
  // y = 1 + 2x + (1 + x)·u, u ~ U(−1/2, 1/2), x ∈ [0, 2]
  // ⇒ q_τ(y|x) = (1 + (τ−½)) + (2 + (τ−½))·x
  private lazy val hetero = {
    val rows = (0 until 6000).map { i =>
      val x = ((i * 0.6180339887498949) % 1.0) * 2.0
      val u = ((i * 1.4142135623730951) % 1.0) - 0.5
      (x, 1.0 + 2.0 * x + (1.0 + x) * u)
    }
    rows.toDF("x", "y")
  }

  test("QuantileReg recovers analytic heteroskedastic quantile lines; slopes order in tau") {
    val m25 = QuantileReg.fit(hetero, "y", Seq("x"), 0.25)
    val m50 = QuantileReg.fit(hetero, "y", Seq("x"), 0.50)
    val m90 = QuantileReg.fit(hetero, "y", Seq("x"), 0.90)
    assert(math.abs(m25.coef(1) - 1.75) < 0.06, s"tau=.25 slope ${m25.coef(1)}")
    assert(math.abs(m50.coef(1) - 2.00) < 0.06, s"tau=.50 slope ${m50.coef(1)}")
    assert(math.abs(m90.coef(1) - 2.40) < 0.06, s"tau=.90 slope ${m90.coef(1)}")
    assert(math.abs(m90.coef(0) - 1.40) < 0.06, s"tau=.90 intercept ${m90.coef(0)}")
    assert(m25.coef(1) < m50.coef(1) && m50.coef(1) < m90.coef(1))
    // the a-posteriori subgradient certificate, independent of the path
    Seq(m25, m50, m90).foreach { m =>
      assert(m.converged, s"tau=${m.tau} not converged after ${m.iters}")
      assert(m.gradGap < 0.11, s"tau=${m.tau} optimality z-gap ${m.gradGap}")
    }
  }

  test("median regression on symmetric noise agrees with OLS; residual sign split ~ tau") {
    val df = hetero
    val qr = QuantileReg.fit(df, "y", Seq("x"), 0.5)
    val ols = Ols.fit(df, "y", Seq("x"))
    assert(math.abs(qr.coef(1) - ols.coef(1)) < 0.05)
    // ~τ of residuals below the fitted line, for an off-center τ
    val m90 = QuantileReg.fit(df, "y", Seq("x"), 0.9)
    val below = df
      .withColumn("r", org.apache.spark.sql.functions.col("y") -
        (org.apache.spark.sql.functions.lit(m90.coef(0)) +
          org.apache.spark.sql.functions.col("x") * m90.coef(1)))
      .where(org.apache.spark.sql.functions.col("r") < 0).count()
    assert(math.abs(below.toDouble / 6000 - 0.9) < 0.02, s"below-share ${below / 6000.0}")
  }
}
