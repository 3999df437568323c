package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Dense reference: same fixed-iteration power method on driver arrays. */
  private def dense(
      edges: Seq[(String, String)], iters: Int, d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = Array.fill(nodes.size)(1.0 / n)
    for (_ <- 0 until iters) {
      val dangling = nodes.indices.filter(i => !out.contains(nodes(i))).map(r).sum
      val contrib = Array.fill(nodes.size)(0.0)
      edges.foreach { case (s, t) => contrib(idx(t)) += r(idx(s)) / out(s) }
      r = nodes.indices.map(i => (1.0 - d) / n + d * (contrib(i) + dangling / n)).toArray
    }
    nodes.zip(r).toMap
  }

  private def run(edges: Seq[(String, String)], iters: Int = 10): Map[String, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("ring graph: ranks stay exactly uniform; vector sums to 1") {
    val ring = (0 until 8).map(i => (s"n$i", s"n${(i + 1) % 8}"))
    val out = run(ring)
    out.values.foreach(v => assert(math.abs(v - 1.0 / 8) < 1e-12))
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("star + backlink matches the dense power method exactly; hub dominates") {
    val edges = (1 to 6).map(i => (s"leaf$i", "hub")) :+ (("hub", "leaf1"))
    val out = run(edges)
    val ref = dense(edges, 10, 0.85)
    out.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12, s"$k: $v vs ${ref(k)}") }
    assert(out("hub") > out("leaf2") * 3, out.toString)
    assert(out("leaf1") > out("leaf2"), "the backlink target outranks plain leaves")
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("dangling mass redistributed: sink graph still sums to 1, matches dense") {
    // b and d are sinks; without the dangling term the vector would leak
    val edges = Seq(("a", "b"), ("a", "d"), ("c", "b"), ("c", "a"))
    val out = run(edges)
    val ref = dense(edges, 10, 0.85)
    out.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12) }
    assert(math.abs(out.values.sum - 1.0) < 1e-9, s"rank leaked: ${out.values.sum}")
  }

  test("pseudo-random 25-node graph matches the dense reference at every node") {
    val edges = (for (i <- 0 until 80) yield {
      val s = (i * 7) % 25
      val t = (i * 13 + 3) % 25
      (s"v$s", s"v$t")
    }).distinct.filter(e => e._1 != e._2)
    val out = run(edges, iters = 12)
    val ref = dense(edges, 12, 0.85)
    out.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12, s"$k") }
  }

  private def densePpr(
      edges: Seq[(String, String)], seeds: Map[String, Double], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2) ++ seeds.keys).distinct.sorted
    val tot = seeds.values.sum
    val sw = nodes.map(n => seeds.getOrElse(n, 0.0) / tot)
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.indices.map(sw).toArray
    for (_ <- 0 until iters) {
      val dangling = nodes.indices.filter(i => !out.contains(nodes(i))).map(r).sum
      val contrib = Array.fill(nodes.size)(0.0)
      edges.foreach { case (a, b) => contrib(idx(b)) += r(idx(a)) / out(a) }
      r = nodes.indices.map(i => (1.0 - d) * sw(i) + d * (contrib(i) + dangling * sw(i))).toArray
    }
    nodes.zip(r).toMap
  }

  test("personalized: matches the dense reference; mass sums to 1; seeds dominate") {
    import org.apache.spark.sql.functions._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "c"))
    val seeds = Seq(("a", 1.0))
    val got = PageRank.personalized(
      edges.toDF("src", "dst"), seeds.toDF("node", "weight"), iters = 12)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = densePpr(edges, Map("a" -> 1.0), 12, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - ref(k)) < 1e-12, s"$k: $v vs ${ref(k)}") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // restart pins mass near the seed: a beats the node farthest from it
    assert(got("a") > got("e"))
  }

  test("personalized with uniform seeds equals plain PageRank (up to IEEE const rounding)") {
    val edges = (0 until 8).map(i => (s"n$i", s"n${(i * 3 + 1) % 8}")) :+ (("n0", "n5"))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val uni = nodes.map(n => (n, 1.0))
    val ppr = PageRank.personalized(
      edges.toDF("src", "dst"), uni.toDF("node", "weight"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pr = PageRank.run(edges.toDF("src", "dst"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ppr.foreach { case (k, v) => assert(math.abs(v - pr(k)) < 1e-12, s"$k: $v vs ${pr(k)}") }
  }

  test("personalized: an off-graph seed keeps its restart share; zero-mass seeds rejected") {
    val edges = Seq(("x", "y"), ("y", "x"))
    val got = PageRank.personalized(
      edges.toDF("src", "dst"), Seq(("ghost", 1.0)).toDF("node", "weight"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // ghost has no out-edges: its rank is (1-d)·1 + d·(its own dangling
    // share) every iteration — strictly positive, and x/y only receive
    // dangling-free link mass (none reaches them) → exactly 0
    assert(got("ghost") > 0.15)
    assert(got("x") === 0.0 && got("y") === 0.0)
    intercept[IllegalArgumentException] {
      PageRank.personalized(
        edges.toDF("src", "dst"), Seq(("x", 0.0)).toDF("node", "weight"), iters = 2)
    }
  }
}
