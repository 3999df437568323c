package graft.sim

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  private def aniso(n: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(17)
    (0 until n).map { i =>
      val v = new Array[Float](8)
      v(0) = (rng.nextGaussian() * 10.0).toFloat // fat axis
      v(1) = (rng.nextGaussian() * 0.1).toFloat // thin axis
      var j = 2
      while (j < 8) { v(j) = (rng.nextGaussian() * 0.05).toFloat; j += 1 }
      (i.toLong, v)
    }
  }

  test("direction matters: a small step along the thin axis outscores a huge step along the fat one") {
    val base = aniso(2000)
    val thin = (9001L, Array(0f, 3f, 0f, 0f, 0f, 0f, 0f, 0f)) // 30σ on the thin axis
    val fat = (9002L, Array(30f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)) // 3σ on the fat axis
    val df = (base :+ thin :+ fat).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", k = 2)
    val out = Outliers.pcaMahalanobis(df, "vec_id", "embedding", model, threshold = 13.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val (thinM2, thinFlag) = out(9001L)
    val (fatM2, fatFlag) = out(9002L)
    assert(thinM2 > 100.0, s"thin-axis outlier must score huge, got $thinM2")
    assert(fatM2 < 20.0, s"fat-axis point is ordinary for this corpus, got $fatM2")
    assert(thinM2 > 10 * fatM2)
    assert(thinFlag === 1)
    // per-dim z-scoring would score BOTH ~30σ-equivalents; the
    // covariance form correctly keeps the fat-axis point unflagged at
    // a chi2(2) 99.9% cut
    assert(fatFlag === 0 || fatM2 < thinM2 / 10)
  }

  test("engine scores equal the dense reference; chi2 calibration is sane on Gaussian data") {
    val data = aniso(1500)
    val df = data.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", k = 4)
    val out = Outliers.pcaMahalanobis(df, "vec_id", "embedding", model, threshold = 13.28)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    val byId = data.toMap
    out.foreach { case (id, (m2, _)) =>
      val ref = Outliers.referenceM2(model, byId(id))
      assert(math.abs(m2 - ref) < 1e-3 + 1e-6 * ref, s"id=$id $m2 vs $ref")
    }
    // chi2(4) 99th percentile ≈ 13.28: ~1% of Gaussian rows flagged
    val frac = out.values.count(_._2 == 1).toDouble / out.size
    assert(frac > 0.0 && frac < 0.05, s"flag rate $frac")
  }
}
