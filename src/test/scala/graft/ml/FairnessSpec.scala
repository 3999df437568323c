package graft.ml

import graft.SparkSpec

class FairnessSpec extends SparkSpec {
  import spark.implicits._

  // group A: 4 pos of 10, pred flags 5, tp=3, fp=2
  // group B: 2 pos of 10, pred flags 2, tp=1, fp=1
  private def planted = {
    def rows(g: String, cells: Seq[(Int, Int, Int)]) =
      cells.flatMap { case (y, p, n) => Seq.fill(n)((g, y, p)) }
    (rows("A", Seq((1, 1, 3), (1, 0, 1), (0, 1, 2), (0, 0, 4))) ++
      rows("B", Seq((1, 1, 1), (1, 0, 1), (0, 1, 1), (0, 0, 7)))).toDF("g", "y", "p")
  }

  test("Fairness.groupRates: hand rates and four-fifths ratios vs the reference group") {
    val out = Fairness.groupRates(planted, "g", "y", "p", refGroup = "A")
      .collect().map(r => r.getString(0) -> r).toMap

    val a = out("A")
    assert(a.getAs[Long]("n") === 10L)
    assert(a.getAs[Double]("base_rate") === 0.4)
    assert(a.getAs[Double]("pred_pos_rate") === 0.5)
    assert(a.getAs[Double]("tpr") === 0.75)
    assert(math.abs(a.getAs[Double]("fpr") - math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(a.getAs[Double]("ppv") === 0.6)
    // the reference group's ratios are all 1
    assert(a.getAs[Double]("parity_ratio") === 1.0)
    assert(a.getAs[Double]("tpr_ratio") === 1.0)

    val b = out("B")
    assert(b.getAs[Double]("pred_pos_rate") === 0.2)
    assert(b.getAs[Double]("parity_ratio") === 0.4) // 0.2/0.5 — fails four-fifths
    assert(b.getAs[Double]("tpr") === 0.5)
    assert(math.abs(b.getAs[Double]("tpr_ratio") -
      math.floor(0.5 / 0.75 * 1e6 + 0.5) / 1e6) < 1e-9)
  }

  test("Fairness.groupRates: degenerate denominators yield nulls, not failures") {
    // group C has no positives (tpr undefined) and no predicted positives (ppv undefined)
    val df = (Seq.fill(5)(("C", 0, 0)) ++ Seq.fill(3)(("A", 1, 1))).toDF("g", "y", "p")
    val out = Fairness.groupRates(df, "g", "y", "p", refGroup = "A")
      .collect().map(r => r.getString(0) -> r).toMap
    val c = out("C")
    assert(c.isNullAt(c.fieldIndex("tpr")))
    assert(c.isNullAt(c.fieldIndex("ppv")))
    assert(c.getAs[Double]("pred_pos_rate") === 0.0)
    // ref group A has fpr undefined (no negatives) → C's fpr_ratio null
    assert(c.isNullAt(c.fieldIndex("fpr_ratio")))
  }
}
