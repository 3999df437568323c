package graft.ops

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("budgetAllocation: hand caps, epochs, leftover; missing target drops") {
    val per = Seq(("a", 100.0), ("b", 100.0), ("ghost", 50.0)).toDF("src", "toks")
    val t = Seq(("a", 0.8), ("b", 0.2)).toDF("src", "share")
    // budget 1000: a wants 800 but caps at 2 epochs = 200; b wants 200, uncapped
    val got = Mixing.budgetAllocation(per, "src", "toks", t, budget = 1000.0, maxEpochs = 2.0)
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(!got.contains("ghost"))
    val a = got("a"); val b = got("b")
    assert(a.getAs[Double]("alloc_tokens") === 200.0 && a.getAs[Boolean]("capped"))
    assert(a.getAs[Double]("epochs") === 2.0)
    assert(b.getAs[Double]("alloc_tokens") === 200.0 && !b.getAs[Boolean]("capped"))
    assert(b.getAs[Double]("epochs") === 2.0)
    // leftover = 800 - 200 = 600, same on every row; realized shares 50/50
    assert(a.getAs[Double]("leftover_tokens") === 600.0)
    assert(b.getAs[Double]("leftover_tokens") === 600.0)
    assert(a.getAs[Double]("realized_share") === 0.5)
  }

  test("budgetAllocation: invalid budget rejected") {
    val per = Seq(("a", 1.0)).toDF("src", "toks")
    val t = Seq(("a", 1.0)).toDF("src", "share")
    intercept[IllegalArgumentException] {
      Mixing.budgetAllocation(per, "src", "toks", t, budget = 0.0, maxEpochs = 1.0)
    }
  }
}
