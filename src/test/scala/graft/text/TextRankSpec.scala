package graft.text

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("TextRank: hub word outranks peripheral words; composition ≡ PageRank on the same edges") {
    // "center" is adjacent to every spoke once; spokes only touch the hub
    val docs = Seq(
      (1L, "center alpha center bravo center charlie center delta"),
      (2L, "center echo center foxtrot")
    ).toDF("doc_id", "text")
    val out = TextRank.keywords(docs, "doc_id", "text", minLen = 4, iters = 10, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.head._1 === "center", s"hub should rank first, got ${out.toSeq}")
    assert(out.map(_._1).toSet ===
      Set("center", "alpha", "bravo", "charlie", "delta", "echo", "foxtrot"))
    // scores are a probability vector (dangling-mass-conserving PageRank)
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-6)

    // compositional parity: same edges fed to PageRank.run directly
    val spokes = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val edges = spokes.flatMap(sp => Seq(("center", sp), (sp, "center"))).toDF("src", "dst")
    val direct = graft.graph.PageRank.run(edges, iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { case (wordK, score) =>
      assert(math.abs(score - math.rint(direct(wordK) * 1e8) / 1e8) < 1e-9, wordK)
    }
  }

  test("TextRank: short tokens filtered, immediate repeats excluded") {
    val docs = Seq((1L, "a of the omega omega omega sigma")).toDF("doc_id", "text")
    val out = TextRank.keywords(docs, "doc_id", "text", minLen = 4, iters = 5, topK = 10)
      .collect().map(_.getString(0)).toSet
    // only the omega—sigma adjacency survives: 'a'/'of'/'the' filtered,
    // omega—omega self-pairs dropped
    assert(out === Set("omega", "sigma"))
  }
}
