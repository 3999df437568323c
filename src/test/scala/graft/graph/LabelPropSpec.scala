package graft.graph

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference: the same synchronous
    * majority-vote/min-label-tie-break dynamics on adjacency maps.
    */
  private def dense(edges: Seq[(String, String)], iters: Int): Map[String, String] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 0 until iters) {
      labels = adj.map { case (node, nbrs) =>
        val votes = nbrs.map(labels).groupBy(identity).view.mapValues(_.size).toMap
        val best = votes.toSeq.map { case (l, c) => (-c, l) }.min
        node -> best._2
      }
    }
    labels
  }

  private def run(edges: Seq[(String, String)], iters: Int): Map[String, String] =
    LabelProp.run(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("two cliques with one bridge: each clique converges to its own community") {
    val c1 = Seq("a1", "a2", "a3", "a4")
    val c2 = Seq("b1", "b2", "b3", "b4")
    val edges = (for (u <- c1; v <- c1 if u < v) yield (u, v)) ++
      (for (u <- c2; v <- c2 if u < v) yield (u, v)) :+ (("a4", "b1"))
    val out = run(edges, iters = 6)
    assert(out === dense(edges, 6))
    val lblA = c1.map(out).distinct
    val lblB = c2.map(out).distinct
    assert(lblA.size === 1, s"clique A split: $lblA")
    assert(lblB.size === 1, s"clique B split: $lblB")
    assert(lblA.head !== lblB.head)
  }

  test("matches the driver-side reference on a random sparse graph, every iteration count") {
    val rng = new scala.util.Random(7)
    val edges = (0 until 120).map(_ => (s"n${rng.nextInt(30)}", s"n${rng.nextInt(30)}"))
      .filter(e => e._1 != e._2).distinct
    for (it <- 1 to 4) {
      assert(run(edges, it) === dense(edges, it), s"iteration $it diverged")
    }
  }

  test("deterministic across runs; direction and duplicate edges are canonicalized") {
    val base = Seq(("x", "y"), ("y", "z"), ("z", "x"), ("z", "w"))
    val messy = base ++ base.map(_.swap) ++ Seq(("x", "y"), ("w", "w"))
    assert(run(base, 3) === run(messy, 3))
    assert(run(base, 3) === run(base, 3))
  }
}
