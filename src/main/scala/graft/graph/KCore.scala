package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling (Seidman 1983, the
  * Batagelj–Zaveršnik fixpoint form): repeatedly delete every node
  * whose degree in the SURVIVING subgraph is < k; what remains is the
  * maximal subgraph with minimum degree ≥ k — the density filter of
  * the graph family ([[Triangles]] measures local cohesion, this one
  * global: spam/template rings and tightly-knit communities survive
  * high k, stragglers and chains peel away).
  *
  * Peeling is a MONOTONE fixpoint: each round's alive set shrinks or
  * stays, and once stable every further round is a no-op. That makes
  * the result replayable with a FIXED round count R ≥ the rounds to
  * convergence — the q-oracle unrolls R rounds and the engine RAISES
  * if convergence needs more than `maxRounds` (so a green gate proves
  * the replay covered the fixpoint).
  *
  * Per round: one induced-subgraph semi-join (edges whose both
  * endpoints are alive), one degree aggregate, one filter — all
  * shuffles on node keys; the alive set is localCheckpoint'ed.
  */
object KCore {

  /** (node, degree) of the k-core — degrees measured IN the core. */
  def core(
      edges: DataFrame,
      k: Int,
      src: String = "src",
      dst: String = "dst",
      maxRounds: Int = 20
  ): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e0 = edges
      .select(
        least(col(src).cast("string"), col(dst).cast("string")).as("u"),
        greatest(col(src).cast("string"), col(dst).cast("string")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // static edge frame exchanged + sorted ONCE on the first semi-join
    // key (opt guide §2.4); the alive set is always hash-partitioned by
    // node (it is a filter of the degree aggregate), so per round the
    // only exchanges left are the two edge-sized ones the degree count
    // fundamentally needs (induced→v, then u-side counts)
    val e = org.apache.spark.sql.graftbridge.Bridge.staticCheckpointKeyed(
      e0.repartition(col("u")).sortWithinPartitions("u"))

    var alive = org.apache.spark.sql.graftbridge.Bridge.iterCheckpointKeyed(
      e0.select(col("u").as("node")).union(e0.select(col("v").as("node")))
        .distinct()) // hash-partitioned by node
    var aliveCount = alive.count()

    def checkpointRdd(d: DataFrame) =
      d.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }

    var degrees: DataFrame = null
    var prevDegrees: DataFrame = null
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= maxRounds,
        s"k-core did not converge within $maxRounds rounds — raise maxRounds " +
          "(and the oracle's unroll depth with it)")
      // alias-aware partitioning: au/av inherit alive's hash(node)
      val au = alive.select(col("node").as("u"))
      val av = alive.select(col("node").as("v"))
      // shared subtree: AQE's exchange reuse does not dedup the
      // SortMergeJoins ABOVE the reused exchanges, so without the lazy
      // keyed checkpoint each degree aggregate recomputed the induced
      // join (the Bradley–Terry denominator lesson, r12). One compute,
      // both aggregates read it; blocks released after the degrees
      // checkpoint lands.
      val induced = org.apache.spark.sql.graftbridge.Bridge.iterCheckpointKeyed(
        e.join(au, Seq("u")).join(av, Seq("v")), eager = false)
      // degree = u-side appearances + v-side appearances (exact integer
      // arithmetic — order-free), replacing the former union+groupBy
      // whose shuffle carried 2×|edges| rows: the v-side count is free
      // (induced is already partitioned by v after the second join),
      // only the u-side count re-exchanges edge rows
      val degV = induced.groupBy(col("v").as("node")).agg(count(lit(1)).as("dv"))
      val degU = induced.groupBy(col("u").as("node")).agg(count(lit(1)).as("du"))
      val degPlan = degU.join(degV, Seq("node"), "full_outer")
        .select(
          col("node"),
          (coalesce(col("du"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("degree"))
      org.apache.spark.sql.graftbridge.Bridge.explainIter(degPlan, "kcore-degrees")
      // survivor count folds into the checkpoint action (one action per
      // round — the former standalone next.count() job is gone)
      val obs = org.apache.spark.sql.Observation()
      degrees = org.apache.spark.sql.graftbridge.Bridge.iterCheckpointKeyed(
        degPlan.observe(obs, count(when(col("degree") >= k, lit(1))).as("alive")))
      val nextCount = obs.get("alive").asInstanceOf[Long]
      // the induced blocks only fed the (now-materialized) degrees; the
      // previous round's degrees fed this round's au/av, also done
      checkpointRdd(induced).foreach(_.unpersist(false))
      if (prevDegrees != null) checkpointRdd(prevDegrees).foreach(_.unpersist(false))
      prevDegrees = degrees
      converged = nextCount == aliveCount
      alive = degrees.where(col("degree") >= k).select("node")
      aliveCount = nextCount
    }
    degrees.where(col("degree") >= k)
  }
}
