package graft.ml

import graft.SparkSpec

class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("combine: hand-checked heterogeneous pair (DL tau2 = 1)") {
    val df = Seq((1.0, 1.0), (3.0, 1.0)).toDF("eff", "se")
    val r = Meta.combine(df, "eff", "se").head()
    assert(r.getAs[Long]("k") === 2L)
    // w = 1 each: fixed mean 2, se sqrt(1/2)
    assert(r.getAs[Double]("beta_fixed") === 2.0)
    assert(r.getAs[Double]("se_fixed") === 0.707107)
    // Q = 10 - 16/2 = 2; c = 2 - 2/2 = 1; tau2 = (2-1)/1 = 1; I2 = .5
    assert(r.getAs[Double]("q_stat") === 2.0)
    assert(r.getAs[Double]("tau2") === 1.0)
    assert(r.getAs[Double]("i2") === 0.5)
    // w* = 1/(1+1): random mean still 2, se sqrt(1/1) = 1
    assert(r.getAs[Double]("beta_random") === 2.0)
    assert(r.getAs[Double]("se_random") === 1.0)
  }

  test("combine: homogeneous studies collapse tau2 to 0; random = fixed weights") {
    val df = Seq((2.0, 1.0), (2.0, 1.0)).toDF("eff", "se")
    val r = Meta.combine(df, "eff", "se").head()
    assert(r.getAs[Double]("q_stat") === 0.0)
    assert(r.getAs[Double]("tau2") === 0.0)
    assert(r.isNullAt(r.fieldIndex("i2"))) // Q = 0: I2 undefined by convention
    assert(r.getAs[Double]("beta_random") === 2.0)
    assert(r.getAs[Double]("se_random") === 0.707107)
  }

  test("combine: k = 1 gives the single study fixed, null heterogeneity") {
    val df = Seq((1.5, 0.5)).toDF("eff", "se")
    val r = Meta.combine(df, "eff", "se").head()
    assert(r.getAs[Long]("k") === 1L)
    assert(r.getAs[Double]("beta_fixed") === 1.5)
    assert(r.getAs[Double]("se_fixed") === 0.5)
    assert(r.isNullAt(r.fieldIndex("q_stat")) && r.isNullAt(r.fieldIndex("tau2")))
    assert(r.isNullAt(r.fieldIndex("beta_random")))
  }

  test("combine: precision weighting pulls toward the tighter study; bad se rows drop") {
    val df = Seq((0.0, 0.1), (10.0, 10.0), (99.0, -1.0), (99.0, 0.0))
      .toDF("eff", "se")
    val r = Meta.combine(df, "eff", "se").head()
    assert(r.getAs[Long]("k") === 2L) // se <= 0 excluded
    assert(math.abs(r.getAs[Double]("beta_fixed")) < 0.01) // w ratio 10000:1
  }
}
