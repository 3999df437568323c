package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) — the DIRECTED-role
  * companion to [[PageRank]]: where PageRank assigns one authority
  * score, HITS separates "points at good things" (hub) from "is pointed
  * at by good things" (authority) — exactly the two roles in a
  * bipartite interaction graph (curators vs documents, buyers vs
  * suppliers, queries vs results). Mutual recursion
  *
  *   a ← Aᵀh / ‖Aᵀh‖₂,   h ← Aa / ‖Aa‖₂
  *
  * with L2 normalization each half-step (unnormalized HITS diverges).
  * Fixed iteration count for cross-engine replay; per half-step: ONE
  * equi-join + groupBy on node keys, a 1-row norm aggregate, and the
  * score frame localCheckpoint'ed (the FE lineage lesson). Scores are
  * maintained over the FULL node set (zero-filled) so the norm and the
  * output cover isolated roles.
  */
object Hits {

  /** (node, hub, auth) after `iters` full iterations over
    * `edges(src, dst)`. All nodes start with hub = 1.
    */
  def run(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      iters: Int = 8
  ): DataFrame = {
    val eRaw = edges.select(col(src).cast("string").as("src"), col(dst).cast("string").as("dst"))
      .distinct()
      .localCheckpoint(true)
    require(!eRaw.isEmpty, "Hits.run: empty edge set (no hubs or authorities to score)")
    // TWO static copies of the edge frame, one per half-step join key,
    // each exchanged + sorted ONCE (opt guide §2.4): the score frames
    // end every half-step hash-partitioned by node (the groupBy/join
    // below), so both per-iteration joins are co-partitioned — zero
    // Exchange and zero edge-side Sort inside the loop.
    import org.apache.spark.sql.graftbridge.Bridge
    val eBySrc = Bridge.staticCheckpointKeyed(
      eRaw.repartition(col("src")).sortWithinPartitions("src"))
    val eByDst = Bridge.staticCheckpointKeyed(
      eRaw.repartition(col("dst")).sortWithinPartitions("dst"))
    val nodes = Bridge.staticCheckpointKeyed(eRaw.select(col("src").as("node"))
      .union(eRaw.select(col("dst").as("node")))
      .distinct()) // hash-partitioned by node
    def ckRdd(d: DataFrame) =
      d.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    // eRaw only existed to derive the keyed copies above (r12 advice:
    // it tripled the resident edge footprint for the whole run)
    ckRdd(eRaw).foreach(_.unpersist(false))

    // the L2 norm rides the same job as the score checkpoint (1-row
    // broadcast, SQL sqrt = java.lang.Math.sqrt — bit-identical to the
    // former driver-side math.sqrt); with a non-empty edge set every
    // norm is positive, so no 0/0
    var hub = Bridge.iterCheckpointKeyed(nodes.withColumn("hub", lit(1.0)))
    var auth = Bridge.iterCheckpointKeyed(nodes.withColumn("auth", lit(0.0)))
    // 2 jobs per iteration, not 4: the raw half-step aggregates are
    // LAZY persists — the score checkpoint's action computes each once
    // into cache, and both its readers (the 1-row norm broadcast and
    // the fill join) reuse it; values are bit-identical
    for (_ <- 0 until iters) {
      val araw = hub.join(eBySrc, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum("hub").as("v"))
        .persist()
      val na = araw.agg(sqrt(coalesce(sum(col("v") * col("v")), lit(0.0))).as("nrm"))
      val prevAuth = auth
      auth = Bridge.iterCheckpointKeyed(nodes
        .join(araw, Seq("node"), "left")
        .na.fill(0.0, Seq("v"))
        .crossJoin(broadcast(na))
        .select(col("node"), (col("v") / col("nrm")).as("auth")))
      araw.unpersist(false)
      ckRdd(prevAuth).foreach(_.unpersist(false))

      val hraw = auth.join(eByDst, col("node") === col("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum("auth").as("v"))
        .persist()
      val nh = hraw.agg(sqrt(coalesce(sum(col("v") * col("v")), lit(0.0))).as("nrm"))
      val prevHub = hub
      hub = Bridge.iterCheckpointKeyed(nodes
        .join(hraw, Seq("node"), "left")
        .na.fill(0.0, Seq("v"))
        .crossJoin(broadcast(nh))
        .select(col("node"), (col("v") / col("nrm")).as("hub")))
      hraw.unpersist(false)
      ckRdd(prevHub).foreach(_.unpersist(false))
    }
    hub.join(auth, Seq("node"))
  }
}
