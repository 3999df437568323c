package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficient — the cohesion
  * member of the graph family ([[graft.dedup.ConnectedComponents]]
  * membership, [[PageRank]] authority, this one density): how clique-ish
  * is a node's neighborhood? High-coefficient nodes in a co-occurrence
  * graph sit inside templated/boilerplate clusters; near-zero
  * coefficients mark bridges and hubs.
  *
  * Scale shape is the classic degree orientation (Cohen 2009): every
  * undirected edge is directed from its lower-(degree, id) endpoint to
  * the higher, so each node's OUT-degree is O(√m) on any graph and the
  * wedge self-join — the only superlinear step — is bounded by
  * Σ outdeg² instead of Σ deg² (a star graph generates ZERO wedges at
  * the hub instead of deg²). Each triangle is emitted exactly once (its
  * orientation-minimal vertex owns it), then exploded to its three
  * corners for per-node counts. Joins shuffle on node keys; nothing is
  * collected.
  */
object Triangles {

  /** Per-node (node, degree, triangles, coeff) over the undirected
    * simple graph induced by `edges` — direction, duplicates and
    * self-loops in the input are canonicalized away. coeff is the local
    * clustering coefficient 2T/(d(d−1)), 0 where degree < 2, rounded to
    * 6dp (an exact integer ratio — one IEEE division on both engines).
    */
  def perNode(edges: DataFrame, src: String = "src", dst: String = "dst"): DataFrame = {
    val e = edges
      .select(
        least(col(src).cast("string"), col(dst).cast("string")).as("u"),
        greatest(col(src).cast("string"), col(dst).cast("string")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // consumed 3× (degrees, orientation, closing probe)

    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // orient each edge from the lower (deg, node) endpoint to the higher
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    val oriented = e
      .join(du, "u").join(dv, "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("b"))
      .localCheckpoint(true) // both sides of the wedge self-join

    // wedges a→b, a→c (b ≠ c) from the low-out-degree adjacency, closed
    // against the canonical undirected edge set
    val out2 = oriented.select(col("a"), col("b").as("c"))
    val wedges = oriented
      .join(out2, Seq("a"))
      .where(col("b") < col("c"))
    val triangles = wedges
      .join(
        e.select(col("u").as("b"), col("v").as("c")),
        Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))

    val perNodeTri = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("triangles"))

    deg
      .join(perNodeTri, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(
        col("node"),
        col("deg").as("degree"),
        col("triangles"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(
            lit(2.0) * col("triangles") / (col("deg") * (col("deg") - 1)), 6))
          .as("coeff"))
  }
}
