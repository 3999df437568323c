package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MipsSpec extends SparkSpec {
  import spark.implicits._

  private def mkVecs(n: Int, d: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    // deliberately varied norms: MIPS must prefer big-norm vectors,
    // cosine must not
    (0 until n).map { i =>
      val scale = 0.5 + (i % 7)
      (i.toLong, Array.fill(d)((rng.nextGaussian() * scale).toFloat))
    }
  }

  test("Mips.topK equals the driver brute force, ties by id") {
    val data = mkVecs(60, 8, 3)
    val df = data.toDF("vec_id", "embedding")
    val got = Mips.topK(df.where($"vec_id" < 5), df, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val m = data.toMap
    for (q <- 0L until 5L) {
      val want = data.filter(_._1 != q)
        .map { case (id, v) => (id, v.zip(m(q)).map { case (a, b) => a.toDouble * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
      assert(got(q).toSeq == want.toSeq, s"query $q")
    }
  }

  test("augment: corpus norms become exactly M; cosine ranking == MIPS ranking") {
    val data = mkVecs(80, 6, 11)
    val df = data.toDF("vec_id", "embedding")
    val (aug, qT, mVal) = Mips.augment(df, "embedding")
    val norms = aug.select(Cosine.norm(col("embedding"))).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - mVal) < 1e-5))
    // MIPS through the cosine stack on augmented vectors
    val queries = df.where($"vec_id" < 6).withColumn("embedding", qT(col("embedding")))
    val viaCos = Cosine.topK(queries, aug, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val direct = Mips.topK(df.where($"vec_id" < 6), df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    assert(viaCos == direct)
    // and cosine on the RAW vectors disagrees somewhere (norms matter)
    val rawCos = Cosine.topK(df.where($"vec_id" < 6), df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    assert(rawCos != direct, "varied norms must separate MIPS from cosine")
  }
}
