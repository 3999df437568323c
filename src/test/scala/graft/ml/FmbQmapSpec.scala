package graft.ml

import graft.SparkSpec

class FmbQmapSpec extends SparkSpec {
  import spark.implicits._

  test("Panel.famaMacBeth: hand per-period slopes, mean/SE, degenerate periods dropped") {
    // period 1: slope 2 exactly; period 2: slope 4 exactly;
    // period 3: var(x)=0 → dropped; period 4: single row → dropped
    val rows =
      Seq((1, 1.0, 2.0), (1, 2.0, 4.0), (1, 3.0, 6.0),
        (2, 1.0, 4.0), (2, 2.0, 8.0), (2, 3.0, 12.0),
        (3, 5.0, 1.0), (3, 5.0, 2.0),
        (4, 1.0, 1.0))
    val r = Panel.famaMacBeth(rows.toDF("t", "x", "y"), "t", "y", "x").head()
    assert(r.getAs[Long]("n_periods") === 2L)
    assert(r.getAs[Long]("n_dropped") === 2L)
    assert(r.getAs[Double]("b_mean") === 3.0) // (2+4)/2
    // sd of {2,4} = sqrt(2); se = sqrt(2)/sqrt(2) = 1
    assert(math.abs(r.getAs[Double]("se") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("t_stat") - 3.0) < 1e-9)
  }

  test("Calibrate.quantileMap: endpoints map to endpoints, ties share a target, monotone") {
    import graft.ops.Calibrate
    val ref = (1 to 100).map(i => Tuple1(i.toDouble * 10)).toDF("v") // 10..1000
    val cur = Seq((1L, 5.0), (2L, 5.0), (3L, 7.0), (4L, 50.0), (5L, 9999.0))
      .toDF("id", "v")
    val out = Calibrate.quantileMap(ref, cur, "v", "id")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("mapped")).toMap
    // n_cur=5, n_ref=100: rank 1 → idx 1 → 10; rank 5 → idx 1+4*99/4=100 → 1000
    assert(out(1L) === 10.0 && out(2L) === 10.0) // tied minima share idx 1
    assert(out(5L) === 1000.0)
    // monotone in the source order
    assert(out(3L) <= out(4L) && out(4L) <= out(5L))
    // middle: rank(50.0)=4 → idx = 1 + 3*99/4 = 1+74 = 75 → ref value 750
    assert(out(4L) === 750.0)
    // rank(7.0)=3 → idx = 1 + 2*99/4 = 50 → 500
    assert(out(3L) === 500.0)
  }

  test("Calibrate.quantileMap: mapping ref onto itself is the identity") {
    import graft.ops.Calibrate
    val vals = Seq(3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0)
    val ref = vals.map(Tuple1(_)).toDF("v")
    val cur = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Calibrate.quantileMap(ref, cur, "v", "id")
      .collect().map(r => r.getAs[Double]("v") -> r.getAs[Double]("mapped"))
    out.foreach { case (v, m) => assert(v === m) }
  }
}
