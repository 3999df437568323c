package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RakingSpec extends SparkSpec {
  import spark.implicits._

  test("ipf: 2x2 toy converges to both margins; weights match the sequential replica") {
    val cells = Seq(("a", "x", 10.0), ("a", "y", 30.0), ("b", "x", 20.0), ("b", "y", 40.0))
      .toDF("r", "c", "n")
    val rt = Seq(("a", 60.0), ("b", 40.0)).toDF("r", "target")
    val ct = Seq(("x", 50.0), ("y", 50.0)).toDF("c", "target")
    val out = Raking.ipf(cells, "r", "c", "n", rt, ct, iters = 20)
      .collect().map(r => (r.getAs[String]("r"), r.getAs[String]("c")) -> r).toMap

    // sequential driver replica of the same 20 sweeps
    var w = Map(("a", "x") -> 1.0, ("a", "y") -> 1.0, ("b", "x") -> 1.0, ("b", "y") -> 1.0)
    val n = Map(("a", "x") -> 10.0, ("a", "y") -> 30.0, ("b", "x") -> 20.0, ("b", "y") -> 40.0)
    val rtm = Map("a" -> 60.0, "b" -> 40.0); val ctm = Map("x" -> 50.0, "y" -> 50.0)
    for (_ <- 1 to 20) {
      val rs = w.groupBy(_._1._1).map { case (r, m) => r -> m.map { case (k, v) => n(k) * v }.sum }
      w = w.map { case (k, v) => k -> v * rtm(k._1) / rs(k._1) }
      val cs = w.groupBy(_._1._2).map { case (c, m) => c -> m.map { case (k, v) => n(k) * v }.sum }
      w = w.map { case (k, v) => k -> v * ctm(k._2) / cs(k._2) }
    }
    w.foreach { case (k, ref) =>
      assert(math.abs(out(k).getAs[Double]("weight") - ref) < 1e-5, s"$k: $ref")
    }
    // column margins exact (last-swept axis), rows within tolerance
    val byC = out.values.groupBy(_.getAs[String]("c"))
      .map { case (c, rs) => c -> rs.map(_.getAs[Double]("raked")).sum }
    assert(math.abs(byC("x") - 50.0) < 1e-4 && math.abs(byC("y") - 50.0) < 1e-4)
    val byR = out.values.groupBy(_.getAs[String]("r"))
      .map { case (r, rs) => r -> rs.map(_.getAs[Double]("raked")).sum }
    assert(math.abs(byR("a") - 60.0) < 1e-3 && math.abs(byR("b") - 40.0) < 1e-3)
  }

  test("ipf: cells without a target drop; zero target zeroes its cells") {
    val cells = Seq(("a", "x", 10.0), ("a", "y", 10.0), ("zz", "x", 5.0))
      .toDF("r", "c", "n")
    val rt = Seq(("a", 20.0)).toDF("r", "target") // no target for zz
    val ct = Seq(("x", 0.0), ("y", 20.0)).toDF("c", "target") // x zeroed
    val out = Raking.ipf(cells, "r", "c", "n", rt, ct, iters = 5).collect()
    assert(!out.exists(_.getAs[String]("r") == "zz"))
    val x = out.find(_.getAs[String]("c") == "x").get
    assert(x.getAs[Double]("weight") === 0.0 && x.getAs[Double]("raked") === 0.0)
  }

  test("designEffect: equal weights deff = 1; unequal weights cost effective n") {
    val eq = Seq.fill(100)(2.5).toDF("w")
    val e = Raking.designEffect(eq, "w").head()
    assert(e.getAs[Long]("n") === 100L)
    assert(e.getAs[Double]("deff") === 1.0)
    assert(e.getAs[Double]("n_eff") === 100.0)
    // half the rows weight 9, half weight 1: deff = n*Σw²/(Σw)² = 1.64
    val uneq = (Seq.fill(50)(9.0) ++ Seq.fill(50)(1.0)).toDF("w")
    val u = Raking.designEffect(uneq, "w").head()
    assert(u.getAs[Double]("deff") === 1.64)
    assert(math.abs(u.getAs[Double]("n_eff") - 100.0 / 1.64) < 1e-4)
    // all-zero weights: null, not a crash
    val z = Raking.designEffect(Seq.fill(3)(0.0).toDF("w"), "w").head()
    assert(z.isNullAt(z.fieldIndex("deff")))
  }
}
