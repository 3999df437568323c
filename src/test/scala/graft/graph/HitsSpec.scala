package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  /** Dense reference: same fixed-iteration normalized power steps. */
  private def dense(
      edges: Seq[(String, String)], iters: Int): Map[String, (Double, Double)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    var hub = Array.fill(nodes.size)(1.0)
    var auth = Array.fill(nodes.size)(0.0)
    for (_ <- 0 until iters) {
      val a = Array.fill(nodes.size)(0.0)
      edges.foreach { case (s, d) => a(idx(d)) += hub(idx(s)) }
      val na = math.sqrt(a.map(x => x * x).sum)
      auth = a.map(_ / na)
      val h = Array.fill(nodes.size)(0.0)
      edges.foreach { case (s, d) => h(idx(s)) += auth(idx(d)) }
      val nh = math.sqrt(h.map(x => x * x).sum)
      hub = h.map(_ / nh)
    }
    nodes.map(n => n -> ((hub(idx(n)), auth(idx(n))))).toMap
  }

  private def run(edges: Seq[(String, String)], iters: Int = 8): Map[String, (Double, Double)] =
    Hits.run(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  test("matches the dense reference on an asymmetric digraph") {
    val edges = Seq(("p1", "q1"), ("p1", "q2"), ("p2", "q1"), ("p3", "q3"), ("q3", "q1"))
    val got = run(edges)
    val ref = dense(edges, 8)
    got.foreach { case (k, (h, a)) =>
      assert(math.abs(h - ref(k)._1) < 1e-12, s"hub $k")
      assert(math.abs(a - ref(k)._2) < 1e-12, s"auth $k")
    }
  }

  test("bipartite star: the shared target is the best authority, the busiest source the best hub") {
    val edges = Seq(("h1", "t"), ("h2", "t"), ("h2", "u"), ("h3", "t"))
    val got = run(edges)
    // t has 3 in-links, u has 1 — t dominates authority
    assert(got("t")._2 > got("u")._2)
    // h2 points at both authorities — best hub
    assert(got("h2")._1 > got("h1")._1 && got("h2")._1 > got("h3")._1)
    // pure sources have zero authority; pure sinks zero hub
    assert(got("h1")._2 === 0.0)
    assert(got("t")._1 === 0.0)
    // L2 norms are 1 after the final normalization
    assert(math.abs(got.values.map(v => v._2 * v._2).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(v => v._1 * v._1).sum - 1.0) < 1e-9)
  }

  test("empty edge set fails fast with a descriptive message, not an NPE") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    val eH = intercept[IllegalArgumentException] { Hits.run(empty) }
    assert(eH.getMessage.contains("empty edge set"))
    val eP = intercept[IllegalArgumentException] { PageRank.run(empty) }
    assert(eP.getMessage.contains("empty edge set"))
    val eQ = intercept[IllegalArgumentException] {
      PageRank.personalized(empty, Seq(("a", 1.0)).toDF("node", "weight"))
    }
    assert(eQ.getMessage.contains("empty edge set"))
  }
}
