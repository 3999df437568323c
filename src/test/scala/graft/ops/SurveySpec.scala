package graft.ops

import graft.SparkSpec

class SurveySpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedMean: hand-computed two-strata estimate with FPC") {
    // stratum a: N=10, sample {2, 4} → mean 3, s² = 2
    // stratum b: N=40, sample {10, 14, 18} → mean 14, s² = 16
    val sample = Seq(("a", 2.0), ("a", 4.0), ("b", 10.0), ("b", 14.0), ("b", 18.0))
      .toDF("s", "v")
    val pop = Seq(("a", 10L), ("b", 40L)).toDF("s", "n_pop")
    val out = Survey.stratifiedMean(sample, pop, "s", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    val wa = 10.0 / 50.0; val wb = 40.0 / 50.0
    val mean = wa * 3.0 + wb * 14.0 // 11.8
    val varA = wa * wa * (1.0 - 2.0 / 10.0) * 2.0 / 2.0
    val varB = wb * wb * (1.0 - 3.0 / 40.0) * 16.0 / 3.0
    val se = math.sqrt(varA + varB)
    assert(out("a").getAs[Double]("mean") === 3.0)
    assert(out("b").getAs[Double]("mean") === 14.0)
    assert(out("a").getAs[Double]("mean_stratified") === q6(mean))
    assert(math.abs(out("b").getAs[Double]("se_fpc") - se) < 1e-6)
    assert(out("a").getAs[Long]("n_sample") === 2L)
    assert(out("b").getAs[Double]("w") === 0.8)
    // CI brackets the mean
    assert(out("a").getAs[Double]("ci_lo") < mean && mean < out("a").getAs[Double]("ci_hi"))
  }

  test("stratifiedMean: census stratum (n = N) contributes ZERO variance — the FPC point") {
    // one stratum, fully enumerated: the estimate is the POPULATION
    // mean with no sampling uncertainty at all — the naive (no-FPC)
    // SE would be sqrt(s²/n) > 0
    val sample = Seq(("a", 1.0), ("a", 3.0)).toDF("s", "v")
    val census = Seq(("a", 2L)).toDF("s", "n_pop")
    val sampled = Seq(("a", 200L)).toDF("s", "n_pop")
    def se(pop: org.apache.spark.sql.DataFrame) =
      Survey.stratifiedMean(sample, pop, "s", "v").head().getAs[Double]("se_fpc")
    assert(se(census) === 0.0, "census stratum: FPC must zero the variance exactly")
    assert(se(sampled) > 0.5, s"2-of-200 sample keeps real uncertainty: ${se(sampled)}")
  }

  test("stratifiedMean: unsampled or single-row stratum nulls the overall estimate, reports the gap") {
    val sample = Seq(("a", 2.0), ("a", 4.0), ("c", 7.0)).toDF("s", "v")
    val pop = Seq(("a", 10L), ("b", 40L), ("c", 5L)).toDF("s", "n_pop")
    val rows = Survey.stratifiedMean(sample, pop, "s", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.size === 3, "population strata all reported")
    assert(rows("b").getAs[Long]("n_sample") === 0L)
    assert(rows("b").isNullAt(rows("b").fieldIndex("mean")))
    assert(rows("a").isNullAt(rows("a").fieldIndex("mean_stratified")),
      "overall estimate must be null when a stratum is unsampled")
  }
}
