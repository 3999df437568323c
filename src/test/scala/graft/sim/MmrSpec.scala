package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // planted candidates for one query: two near-identical high-rel
  // vectors, one diverse mid-rel vector
  private def planted = Seq(
    ("q", "dupA", 0.95, Array(1.0f, 0.0f, 0.0f)),
    ("q", "dupB", 0.94, Array(0.999f, 0.04f, 0.0f)),
    ("q", "diverse", 0.70, Array(0.0f, 1.0f, 0.0f))
  ).toDF("qid", "cid", "rel", "vec")

  test("Mmr.rerank: diversity beats the redundant near-duplicate at rank 2") {
    val out = Mmr.rerank(planted, "qid", "cid", "rel", "vec", k = 3, lambda = 0.5)
      .orderBy("sel_rank").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("dupA", "diverse", "dupB"))
    // rank 1 carries the empty-set sentinel
    assert(out(0).getAs[Double]("maxsim") === -1.0)
    // rank 2's maxsim is cos(diverse, dupA) ≈ 0
    assert(math.abs(out(1).getAs[Double]("maxsim")) < 0.01)
    // rank 3's maxsim is cos(dupB, dupA) ≈ 1 (the near-duplicate)
    assert(out(2).getAs[Double]("maxsim") > 0.99)
  }

  test("Mmr.rerank: lambda = 1 is pure relevance order") {
    val out = Mmr.rerank(planted, "qid", "cid", "rel", "vec", k = 3, lambda = 1.0)
      .orderBy("sel_rank").collect()
    assert(out.map(_.getString(2)).toSeq === Seq("dupA", "dupB", "diverse"))
  }

  test("Mmr.rerank: queries advance independently; short shortlists return all") {
    val two = planted.unionByName(
      Seq(("r", "only", 0.5, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "cid", "rel", "vec"))
    val out = Mmr.rerank(two, "qid", "cid", "rel", "vec", k = 2, lambda = 0.7)
    val byQ = out.collect().groupBy(_.getString(0))
    assert(byQ("q").length === 2)
    assert(byQ("r").length === 1) // fewer candidates than k
    assert(byQ("r").head.getInt(1) === 1)
  }

  test("Mmr.rerank: score column equals the documented objective") {
    val out = Mmr.rerank(planted, "qid", "cid", "rel", "vec", k = 2, lambda = 0.5)
      .orderBy("sel_rank").collect()
    out.foreach { r =>
      val expect = math.floor(
        (0.5 * r.getAs[Double]("rel") - 0.5 * r.getAs[Double]("maxsim")) * 1e4 + 0.5) / 1e4
      // maxsim is itself 4dp-quantized on output; recompute within 1e-4
      assert(math.abs(r.getAs[Double]("score") - expect) < 2e-4)
    }
  }
}
