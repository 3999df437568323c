package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkipGramSpec extends SparkSpec {
  import spark.implicits._

  test("window pairing without subsampling: hand-counted pairs on a b c d, symmetric") {
    // t huge -> p = 1 everywhere, no token dropped
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = SkipGram.pairCounts(df, "text", "doc_id", window = 2, t = 1e9)
      .as[(String, String, Long)].collect()
      .map { case (c, x, n) => (c, x) -> n }.toMap
    // window 2 over positions 1..4: a-(b,c) b-(a,c,d) c-(a,b,d) d-(b,c)
    val expect = Map(
      ("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "a") -> 1L, ("b", "c") -> 1L, ("b", "d") -> 1L,
      ("c", "a") -> 1L, ("c", "b") -> 1L, ("c", "d") -> 1L,
      ("d", "b") -> 1L, ("d", "c") -> 1L)
    assert(got === expect)
    got.foreach { case ((c, x), n) => assert(got((x, c)) === n) } // symmetry
  }

  test("subsampling drops common tokens harder, deterministic under partitioning") {
    val docs = graft.util.Tables.documents(spark, sf)
    val kept = SkipGram.keptStream(docs, "text", "doc_id", t = 1e-3, salt = "sg")
    val keepRate = kept.groupBy("token").agg(count(lit(1)).as("k"))
    val raw = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    val rates = raw.join(keepRate, Seq("token"), "left")
      .na.fill(0L, Seq("k"))
      .select(col("token"), col("n"), (col("k").cast("double") / col("n")).as("rate"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val common = rates.filter(_._1 >= 500).map(_._2)
    val rare = rates.filter(_._1 < 50).map(_._2)
    assert(common.nonEmpty && rare.nonEmpty)
    assert(common.max < rare.min,
      s"common keep ${common.max} should be below rare keep ${rare.min}")

    val a = SkipGram.pairCounts(docs, "text", "doc_id")
      .orderBy("center", "context").collect().toSeq
    val b = SkipGram.pairCounts(docs.repartition(7), "text", "doc_id")
      .orderBy("center", "context").collect().toSeq
    assert(a === b)
  }

  test("re-positioning after subsample: survivors separated by dropped tokens DO pair") {
    // craft: token 'z' is extremely common corpus-wide so it gets
    // dropped; 'p' and 'q' are rare and survive. In raw positions p and
    // q sit 3 apart (> window 2); post-subsample they are adjacent.
    val filler = Array.fill(2000)("z").mkString(" ")
    val df = Seq(
      (1L, s"p z z q"),
      (2L, filler) // makes z frequent enough that subsampling kills it
    ).toDF("doc_id", "text")
    // t = 5e-4: rare f = 1/2004 gives keep prob (sqrt(f/t)+1)*t/f > 1
    // (capped at 1 — p and q are GUARANTEED to survive), while z at
    // f ~ 1 keeps ~2% of its occurrences
    val pairs = SkipGram.pairCounts(df, "text", "doc_id", window = 1, t = 5e-4)
      .as[(String, String, Long)].collect()
      .map { case (c, x, n) => (c, x) -> n }.toMap
    assert(pairs.contains(("p", "q")) || pairs.contains(("q", "p")),
      s"survivors failed to pair after re-positioning: $pairs")
  }
}
