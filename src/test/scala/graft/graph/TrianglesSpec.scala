package graft.graph

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(String, String)]): Map[String, (Long, Long, Double)] =
    Triangles.perNode(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("K4: every node sits in 3 triangles with coefficient 1") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for (u <- nodes; v <- nodes if u < v) yield (u, v)
    val out = run(k4)
    assert(out.size === 4)
    out.values.foreach { case (deg, tri, coeff) =>
      assert(deg === 3L); assert(tri === 3L); assert(coeff === 1.0)
    }
  }

  test("path and star graphs have zero triangles and zero coefficients") {
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    run(path).values.foreach { case (_, tri, coeff) =>
      assert(tri === 0L); assert(coeff === 0.0)
    }
    val star = (1 to 6).map(i => ("hub", s"leaf$i"))
    val out = run(star)
    assert(out("hub") === ((6L, 0L, 0.0)))
    assert(out("leaf1") === ((1L, 0L, 0.0)))
  }

  test("triangle with a pendant: hand-computed counts and coefficients") {
    // a-b-c triangle, d hangs off a
    val out = run(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("a", "d")))
    val (da, ta, ca) = out("a")
    assert(da === 3L && ta === 1L)
    assert(math.abs(ca - 1.0 / 3) < 1e-6) // 2·1/(3·2), rounded to 6dp
    assert(out("b")._1 === 2L && out("b")._2 === 1L && out("b")._3 === 1.0)
    assert(out("d") === ((1L, 0L, 0.0)))
  }

  test("direction, duplicates and self-loops are canonicalized away") {
    val messy = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"), // one undirected edge
      ("b", "c"), ("c", "a"),
      ("a", "a") // self-loop dropped
    )
    val clean = run(Seq(("a", "b"), ("b", "c"), ("a", "c")))
    assert(run(messy) === clean)
    clean.values.foreach { case (deg, tri, coeff) =>
      assert(deg === 2L); assert(tri === 1L); assert(coeff === 1.0)
    }
  }

  test("two K4 blocks sharing one vertex: shared node counts both blocks' triangles") {
    val blockA = Seq("x", "a1", "a2", "a3")
    val blockB = Seq("x", "b1", "b2", "b3")
    val edges = (for (u <- blockA; v <- blockA if u < v) yield (u, v)) ++
      (for (u <- blockB; v <- blockB if u < v) yield (u, v))
    val out = run(edges)
    assert(out("x")._1 === 6L)
    assert(out("x")._2 === 6L) // 3 per block
    assert(math.abs(out("x")._3 - 2.0 * 6 / (6 * 5)) < 1e-6)
    assert(out("a1") === ((3L, 3L, 1.0)))
  }
}
