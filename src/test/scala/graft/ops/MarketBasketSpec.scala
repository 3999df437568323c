package graft.ops

import graft.SparkSpec

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("pairRules: hand-computed support/confidence/lift; minSupport filters; duplicates collapse") {
    // baskets: 1{a,b,c} 2{a,b} 3{a,c} 4{b}; duplicate (1,a) row must not double-count
    val rows = Seq(
      (1, "a"), (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "c"),
      (4, "b"))
    val df = rows.toDF("basket", "item")
    val out = MarketBasket.pairRules(df, "basket", "item", minSupport = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap // (item_a, item_b)

    val ab = out(("a", "b"))
    assert(ab.getLong(2) === 2L && ab.getLong(3) === 3L && ab.getLong(4) === 3L)
    assert(ab.getLong(5) === 4L)
    assert(ab.getDouble(6) === 0.5)                       // support 2/4
    assert(math.abs(ab.getDouble(7) - 2.0 / 3) < 1e-6)    // conf a->b
    assert(math.abs(ab.getDouble(8) - 2.0 / 3) < 1e-6)    // conf b->a
    assert(math.abs(ab.getDouble(9) - 8.0 / 9) < 1e-4)    // lift 4*2/(3*3)

    val ac = out(("a", "c"))
    assert(ac.getLong(2) === 2L && ac.getLong(4) === 2L)
    assert(math.abs(ac.getDouble(9) - 4.0 * 2 / (3 * 2)) < 1e-4) // lift > 1: c implies a

    val bc = out(("b", "c"))
    assert(bc.getLong(2) === 1L)

    // minSupport = 2 drops the (b, c) pair
    val filtered = MarketBasket.pairRules(df, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(filtered === Set(("a", "b"), ("a", "c")))
  }
}
