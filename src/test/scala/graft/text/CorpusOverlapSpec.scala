package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvAgg

/** KMV corpus-overlap sketches (T33): exactness below k, partition/
  * merge-order invariance of the kept values, estimator accuracy on a
  * known cardinality, pairwise jaccard endpoints, and the persisted
  * append path being exactly the from-scratch sketch of the union.
  */
class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  test("sketch of a corpus with fewer than k distinct tokens is the exact distinct hash set") {
    val df = docs(Seq((1L, "a b c a", "s"), (2L, "c d", "s")))
    val sk = CorpusOverlap.sketches(df, "text", "source", k = 16).head()
    assert(sk.getAs[Long]("n_kept") === 4L)
    assert(sk.getAs[Double]("distinct_est") === 4.0)
    assert(sk.getAs[Long]("theta") === CorpusOverlap.M)
    val kmv = sk.getSeq[Long](sk.fieldIndex("kmv"))
    assert(kmv === kmv.sorted)
  }

  test("kept values are partition-invariant and equal the k smallest distinct hashes") {
    val words = (0 until 500).map(i => s"w$i")
    val df = (0 until 50)
      .map(i => (i.toLong, words.slice(i * 10, i * 10 + 10).mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val k = 32
    def kept(parts: Int): Seq[Long] = {
      val r = CorpusOverlap.sketches(df.repartition(parts), "text", "source", k).head()
      r.getSeq[Long](r.fieldIndex("kmv")).toSeq
    }
    val a = kept(1)
    val b = kept(7)
    assert(a === b)
    // brute-force reference: k smallest distinct md5-60 hashes
    val ref = df
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(graft.functions.SharedHash.md5Long60(col("tok")).as("h"))
      .distinct().orderBy("h").limit(k)
      .as[Long].collect().toSeq
    assert(a === ref)
  }

  test("distinct estimate lands within 4 sigma of a known cardinality") {
    val n = 20000
    val k = 256
    val df = (0 until n).map(i => (i.toLong, s"tok$i", "s")).toDF("doc_id", "text", "source")
    val est = CorpusOverlap.sketches(df, "text", "source", k)
      .head().getAs[Double]("distinct_est")
    val sigma = n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) <= 4 * sigma, s"est $est vs $n (sigma $sigma)")
  }

  test("pairwise: identical corpora give jaccard 1, disjoint corpora give 0") {
    val text = (0 until 300).map(i => s"t$i").mkString(" ")
    val other = (0 until 300).map(i => s"u$i").mkString(" ")
    val df = docs(Seq((1L, text, "a"), (2L, text, "b"), (3L, other, "c")))
    val sk = CorpusOverlap.sketches(df, "text", "source", k = 64)
    val pairs = CorpusOverlap.pairOverlap(sk)
      .select("src_a", "src_b", "jaccard_kmv").as[(String, String, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs(("a", "b")) === 1.0)
    assert(pairs(("a", "c")) === 0.0)
    assert(pairs(("b", "c")) === 0.0)
  }

  test("append path: saved sketches + new batch == from-scratch sketch of the union, value for value") {
    val batch1 = (0 until 40).map(i => (i.toLong, s"x$i y${i % 7}", "s1")) ++
      (0 until 30).map(i => (100L + i, s"z$i", "s2"))
    val batch2 = (0 until 25).map(i => (200L + i, s"x${i * 3} w$i", "s1")) ++
      (0 until 10).map(i => (300L + i, s"z$i q$i", "s2"))
    val k = 16
    val dir = java.nio.file.Files.createTempDirectory("kmv_idx").toString
    val sk1 = CorpusOverlap.sketches(docs(batch1), "text", "source", k)
    CorpusOverlap.saveSketches(spark, sk1, dir, k)
    val appended = CorpusOverlap
      .appendSketches(spark, dir, docs(batch2), "text", "source")
      .select("corpus", "kmv").as[(String, Seq[Long])].collect().toMap
    val scratch = CorpusOverlap
      .sketches(docs(batch1 ++ batch2), "text", "source", k)
      .select("corpus", "kmv").as[(String, Seq[Long])].collect().toMap
    assert(appended === scratch)
  }

  test("loadSketches round-trips and rejects a wrong-kind entry") {
    val df = docs(Seq((1L, "a b c", "s")))
    val k = 8
    val dir = java.nio.file.Files.createTempDirectory("kmv_idx2").toString
    val sk = CorpusOverlap.sketches(df, "text", "source", k)
    CorpusOverlap.saveSketches(spark, sk, dir, k)
    val loaded = CorpusOverlap.loadSketches(spark, dir)
    assert(
      loaded.select("corpus", "kmv", "n_kept", "theta", "distinct_est").collect().toSeq ===
        sk.select("corpus", "kmv", "n_kept", "theta", "distinct_est").collect().toSeq)
    val e = intercept[Exception] {
      graft.sources.IndexCatalog.open(spark, dir, "opq")
    }
    assert(e.getMessage.contains("kind"))
  }

  test("kmv aggregate dedups within and across rows") {
    val df = Seq(
      Seq(5L, 5L, 3L), Seq(3L, 9L), Seq(9L, 1L)
    ).toDF("hs")
    val kept = df.agg(KmvAgg.kmv(col("hs"), 16)).head().getSeq[Long](0)
    assert(kept === Seq(1L, 3L, 5L, 9L))
  }
}
