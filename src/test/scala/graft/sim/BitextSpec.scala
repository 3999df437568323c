package graft.sim

import graft.SparkSpec

class BitextSpec extends SparkSpec {
  import spark.implicits._

  // planted geometry: 6 true pairs (same direction ± tiny noise), one
  // HUB target vector similar to everything, distractor targets
  private def mkVec(seed: Int, dim: Int = 16): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }
  private def jitter(v: Array[Float], seed: Int, eps: Float): Array[Float] = {
    val r = new scala.util.Random(seed)
    v.map(x => x + eps * r.nextGaussian().toFloat)
  }

  test("margin mining recovers planted pairs and rejects the hub that raw cosine admits") {
    val bases = (0 until 6).map(i => mkVec(100 + i))
    // hub: the normalized mean of everything — cosine-close to all
    val hub = {
      val m = new Array[Float](16)
      bases.foreach(b => for (i <- m.indices) m(i) += b(i) / 6.0f)
      m
    }
    val src = bases.zipWithIndex.map { case (v, i) => (s"s$i", jitter(v, 200 + i, 0.05f)) }
    val tgt = bases.zipWithIndex.map { case (v, i) => (s"t$i", jitter(v, 300 + i, 0.05f)) } ++
      Seq(("hub", hub)) ++
      (0 until 4).map(i => (s"junk$i", mkVec(400 + i)))

    val srcDf = src.toDF("id", "vec")
    val tgtDf = tgt.toDF("id", "vec")
    val mined = Bitext.mineParallel(srcDf, tgtDf, "id", "vec", k = 4, minMargin = 1.1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // every true pair found, nothing mapped to the hub or junk
    (0 until 6).foreach { i =>
      assert(mined.get(s"s$i").contains(s"t$i"), s"s$i -> ${mined.get(s"s$i")}")
    }
    assert(!mined.values.exists(v => v == "hub" || v.startsWith("junk")), mined.toString)

    // control: raw-cosine best WITHOUT the margin denominator — with a
    // strong-enough hub the margin criterion's value shows as a higher
    // score separation; here verify margins of true pairs clear 1.1
    val all = Bitext.mineParallel(srcDf, tgtDf, "id", "vec", k = 4, minMargin = 0.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    all.filter(t => t._2 == s"t${t._1.drop(1)}").foreach { case (_, _, m) =>
      assert(m > 1.1, s"true-pair margin $m")
    }
  }

  test("a source with no true counterpart falls below the margin threshold") {
    val bases = (0 until 4).map(i => mkVec(500 + i))
    val src = bases.zipWithIndex.map { case (v, i) => (s"s$i", jitter(v, 600 + i, 0.05f)) } :+
      (("orphan", mkVec(999)))
    // targets for 0..3 only; orphan has nothing parallel
    val tgt = bases.zipWithIndex.map { case (v, i) => (s"t$i", jitter(v, 700 + i, 0.05f)) } ++
      (0 until 6).map(i => (s"bg$i", mkVec(800 + i)))
    val mined = Bitext.mineParallel(
      src.toDF("id", "vec"), tgt.toDF("id", "vec"), "id", "vec", k = 4, minMargin = 1.1, minCos = 0.5)
      .collect().map(r => r.getString(0)).toSet
    assert(!mined.contains("orphan"), "orphan must not pass the margin+floor gate")
    assert((0 until 4).forall(i => mined.contains(s"s$i")))
  }
}
