package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)], k: Int): Map[String, Long] =
    KCore.core(edges.toDF("src", "dst"), k = k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("clique with a pendant chain: the clique is the 3-core, the chain peels away") {
    val clique = Seq("a", "b", "c", "d")
    val edges = (for (u <- clique; v <- clique if u < v) yield (u, v)) ++
      Seq(("d", "p1"), ("p1", "p2"), ("p2", "p3"))
    val core3 = run(edges, 3)
    assert(core3.keySet === Set("a", "b", "c", "d"))
    core3.values.foreach(d => assert(d === 3L))
    // 1-core keeps everything (no isolated nodes in an edge list)
    assert(run(edges, 1).keySet === (clique ++ Seq("p1", "p2", "p3")).toSet)
    // 4-core is empty: the clique needs internal degree 4
    assert(run(edges, 4).isEmpty)
  }

  test("cascade peeling: removing leaves re-exposes new low-degree nodes across rounds") {
    // path of 6 + a triangle at the end: 2-core = the triangle only,
    // found after peeling the path one layer per round
    val edges = Seq(("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n4", "n5"), ("n5", "n6"),
      ("n6", "t1"), ("t1", "t2"), ("t2", "t3"), ("t3", "t1"))
    val core2 = run(edges, 2)
    assert(core2.keySet === Set("t1", "t2", "t3"))
    core2.values.foreach(d => assert(d === 2L))
  }

  test("degrees are measured IN the core, not the input graph; maxRounds guard raises") {
    // K4 plus a pendant on every vertex: input degree 4 each, core degree 3
    val k4 = Seq("a", "b", "c", "d")
    val edges = (for (u <- k4; v <- k4 if u < v) yield (u, v)) ++
      k4.map(u => (u, s"leaf_$u"))
    val core = run(edges, 3)
    assert(core.keySet === k4.toSet)
    core.values.foreach(d => assert(d === 3L, "core degree must exclude peeled leaves"))
    val ex = intercept[IllegalArgumentException] {
      // a 10-long path needs ~5 rounds to fully peel at k=2
      val path = (1 until 10).map(i => (s"x$i", s"x${i + 1}"))
      KCore.core(path.toDF("src", "dst"), k = 2, maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("converge"))
  }
}
