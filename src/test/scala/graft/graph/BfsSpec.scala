package graft.graph

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  test("hopDistance: hand-checkable path graph with two seeds; unreached absent") {
    // a-b-c-d-e chain plus isolated x->y; seeds {a, y}
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
      .toDF("src", "dst")
    val seeds = Seq("a", "y").toDF("node")
    val got = Bfs.hopDistance(edges, seeds, maxHops = 10).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 4, "y" -> 0))
    // directed: x is upstream of seed y and stays unreached
    assert(!got.contains("x"))
  }

  test("hopDistance honors maxHops and picks the SHORTEST route on a diamond") {
    // a->b->c->d and a->d: d settles at 1, not 3
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")).toDF("src", "dst")
    val got = Bfs.hopDistance(edges, Seq("a").toDF("node"), maxHops = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "d" -> 1, "c" -> 2))
    val capped = Bfs.hopDistance(edges, Seq("a").toDF("node"), maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(capped == Map("a" -> 0, "b" -> 1, "d" -> 1))
  }

  test("hopDistance: empty seed set yields empty output, cycles terminate") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    assert(Bfs.hopDistance(edges, Seq.empty[String].toDF("node")).count() == 0L)
    val cyc = Bfs.hopDistance(edges, Seq("a").toDF("node"), maxHops = 50).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cyc == Map("a" -> 0, "b" -> 1))
  }
}
