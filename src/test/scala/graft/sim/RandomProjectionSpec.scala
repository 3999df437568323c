package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projection matches a driver-side reference mat-vec exactly") {
    val model = RandomProjection.fit(dim = 8, k = 4, salt = "t")
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array(-0.5f, 0f, 0.25f, 1f, 0f, 0f, 0f, 2f)))
    val out = RandomProjection
      .projectLong(vecs.toDF("id", "v"), "id", "v", model)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getFloat(2))
      .toMap
    for ((id, v) <- vecs; r <- 0 until 4) {
      var s = 0.0
      for (j <- 0 until 8) s += model.flat(r * 8 + j).toDouble * v(j).toDouble
      assert(out((id, r)) === s.toFloat, s"id=$id dim=$r")
    }
  }

  test("sign matrix is deterministic from the salt and balanced-ish") {
    val m1 = RandomProjection.fit(64, 16)
    val m2 = RandomProjection.fit(64, 16)
    assert(m1.flat.toSeq === m2.flat.toSeq)
    val m3 = RandomProjection.fit(64, 16, salt = "other")
    assert(m1.flat.toSeq !== m3.flat.toSeq)
    // md5 parity should not be wildly skewed
    val pos = m1.flat.count(_ > 0)
    assert(pos > 400 && pos < 624, s"sign balance off: $pos of 1024")
    assert(m1.flat.forall(f => math.abs(f) === 0.25f)) // 1/sqrt(16) exact
  }

  test("linearity and approximate norm preservation (the JL contract)") {
    val model = RandomProjection.fit(dim = 64, k = 32, salt = "jl-spec")
    val rng = new scala.util.Random(5)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(64)(rng.nextGaussian().toFloat)))
    val df = vecs.toDF("id", "v")
    val proj = df.select(col("id"), model.project(col("v")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // E[||Px||^2] = ||x||^2 for sign-JL; with k=32 the per-vector ratio
    // concentrates — mean over 200 vectors must be tight
    val ratios = vecs.map { case (id, v) =>
      val pn = proj(id).map(x => x.toDouble * x).sum
      val vn = v.map(x => x.toDouble * x).sum
      pn / vn
    }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"mean norm ratio $mean")
    assert(ratios.count(r => r > 0.3 && r < 2.2) >= 195, "distortion tail too heavy")
    // linearity: P(x+y) = Px + Py up to float rounding
    val x = vecs(0)._2; val y = vecs(1)._2
    val sum = x.zip(y).map { case (a, b) => a + b }
    val pSum = Seq((0L, sum)).toDF("id", "v")
      .select(model.project(col("v"))).head().getSeq[Float](0)
    val direct = proj(0L).zip(proj(1L)).map { case (a, b) => a + b }
    pSum.zip(direct).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
  }
}
