package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** PageRank by synchronous power iteration — the second graph operator
  * beside [[graft.dedup.ConnectedComponents]]: where CC answers "which
  * near-dup cluster is this", PageRank answers "which nodes matter" —
  * seed-document selection over a citation/link graph, source authority
  * for curation weighting, hub detection in user-interaction graphs.
  *
  *   r ← (1−d)/n + d·(Σ_incoming r_src/outdeg_src + danglingMass/n)
  *
  * with the dangling mass (rank parked on sink nodes) redistributed
  * uniformly — the standard convention, and the part naive
  * implementations drop (rank then leaks and the vector stops summing
  * to 1; the spec pins Σr = 1 every iteration).
  *
  * Scale shape per iteration: ONE equi-join ranks⋈edges on the source
  * key, one groupBy(dst), a 1-row dangling aggregate, a left join back
  * to the node set for zero-indegree nodes — all shuffles on the node
  * key. The rank frame is truncated each iteration through
  * [[org.apache.spark.sql.graftbridge.Bridge.iterCheckpoint]] —
  * localCheckpoint by default, reliable checkpoint under
  * `spark.graft.checkpoint.reliable` (the FE
  * lesson: an uncheckpointed iterative frame's plan doubles per sweep
  * and the analyzer, not the cluster, becomes the bottleneck).
  * Fixed iteration count keeps the result deterministic and
  * cross-engine replayable (the q166 oracle unrolls the same
  * iterations in SQL).
  */
object PageRank {

  /** (node, rank) after `iters` iterations over `edges(src, dst)`.
    * Multi-edges should be pre-deduplicated by the caller if unwanted;
    * self-loops are legal.
    */
  def run(
      edges: DataFrame,
      src: String = "src",
      dst: String = "dst",
      iters: Int = 10,
      damping: Double = 0.85
  ): DataFrame = {
    val eRaw = edges.select(col(src).cast("string").as("src"), col(dst).cast("string").as("dst"))
      .persist()
    require(!eRaw.isEmpty, "PageRank.run: empty edge set (no nodes to rank)")
    // distinct column name so the edge frame can re-join without a
    // self-join ambiguity
    val outdeg = eRaw.groupBy(col("src").as("od_src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    // STATIC per-iteration inputs, exchanged ONCE (opt guide §2.4 —
    // remove shuffles outright): the out-degree rides ON the edge row
    // (it never changes), the edge frame is hash-partitioned and
    // intra-partition sorted on the join key, and the sink flag rides
    // on the node row. localCheckpoint pins partitioning + ordering on
    // the LogicalRDD leaf, so every iteration's ranks⋈edges join is
    // co-partitioned (zero Exchange, zero edge-side Sort) and the
    // dangling mass needs no join at all. Contribution addends are the
    // SAME rank/outdeg operands as the former per-iteration join plan —
    // only summation order moves, under the 8dp output quantizer.
    val e = Bridge.staticCheckpointKeyed(eRaw.join(outdeg, col("src") === col("od_src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src"))
      .sortWithinPartitions("src"))
    val nodes = Bridge.staticCheckpointKeyed(eRaw.select(col("src").as("node"))
      .union(eRaw.select(col("dst").as("node")))
      .distinct()
      .join(outdeg, col("node") === col("od_src"), "left")
      .select(col("node"), col("od_src").isNull.as("is_sink"))) // hash(node) from distinct
    val n = nodes.count().toDouble
    eRaw.unpersist(false)

    var ranks = Bridge.iterCheckpointKeyed(nodes.withColumn("rank", lit(1.0 / n)))
    // checkpoint CADENCE, not per-iteration (the FE probe lesson): odd
    // iterations persist LAZILY (no job — the even iteration's
    // checkpoint action computes them once into cache, and both the
    // dangling-broadcast subtree and the contribs path reuse it), even
    // iterations and the last take the one eager checkpoint job. Jobs
    // per iteration: 0.5 + ε instead of 1 — at sf0.1 the graph loops
    // are pure job-latency, and values are bit-identical (checkpoint
    // placement never changes what is computed).
    var midFrame: Option[DataFrame] = None
    for (it <- 1 to iters) {
      // rank parked on sinks (no out-edges) this iteration: a 1-row frame
      // broadcast into the update expression rather than head()'d — the
      // dangling aggregate and the contribs pass ride ONE job (the
      // checkpoint action), halving driver round-trips per iteration
      val dangling = ranks.where(col("is_sink"))
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      val contribs = ranks.where(!col("is_sink"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .na.fill(0.0, Seq("contrib"))
        .crossJoin(broadcast(dangling))
        .select(
          col("node"),
          col("is_sink"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (col("contrib") + col("dmass") / lit(n))).as("rank"))
      if (it % 2 == 1 && it != iters) {
        ranks = next.persist()
        midFrame = Some(ranks)
      } else {
        ranks = Bridge.iterCheckpointKeyed(next)
        midFrame.foreach(_.unpersist(false)); midFrame = None
      }
    }
    ranks.select("node", "rank")
  }

  /** Personalized PageRank — restart mass goes to a SEED distribution
    * instead of uniformly (and so does the dangling mass, the PPR
    * convention): "expand from these trusted documents/domains" — seed
    * -based curation growth, related-item scoring, topic-conditional
    * authority. Seeds not in the edge set still receive their restart
    * share (they are added to the node set); seed weights are
    * normalized internally.
    *
    *   r ← (1−d)·s + d·(Σ_in r/outdeg + danglingMass·s)
    *
    * Same per-iteration shape as [[run]]: one equi-join, one groupBy,
    * a 1-row dangling aggregate, localCheckpoint. Kept as its own loop
    * rather than expressing run() through it: run()'s `(1−d)/n` and
    * PPR's `(1−d)·(1/n)` round differently in IEEE arithmetic and
    * q166's replay pins run()'s exact trajectory.
    */
  def personalized(
      edges: DataFrame,
      seeds: DataFrame,
      seedNode: String = "node",
      seedWeight: String = "weight",
      src: String = "src",
      dst: String = "dst",
      iters: Int = 10,
      damping: Double = 0.85
  ): DataFrame = {
    val eRaw = edges.select(col(src).cast("string").as("src"), col(dst).cast("string").as("dst"))
      .persist()
    require(!eRaw.isEmpty, "PageRank.personalized: empty edge set (no nodes to rank)")
    val sTotal = seeds.agg(sum(col(seedWeight).cast("double"))).head().getDouble(0)
    require(sTotal > 0, "seed weights must have positive mass")
    val sNorm = seeds
      .select(
        col(seedNode).cast("string").as("node"),
        (col(seedWeight).cast("double") / sTotal).as("sw"))
      .groupBy("node").agg(sum("sw").as("sw")) // collapse duplicate seeds
    val outdeg = eRaw.groupBy(col("src").as("od_src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    // same static-input discipline as run(): out-degree rides the edge
    // row, sink flag + seed weight ride the node row, both frames
    // exchanged once and co-partitioned with the rank frame for every
    // iteration (opt guide §2.4)
    val e = Bridge.staticCheckpointKeyed(eRaw.join(outdeg, col("src") === col("od_src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .repartition(col("src"))
      .sortWithinPartitions("src"))
    val nodes = Bridge.staticCheckpointKeyed(eRaw.select(col("src").as("node"))
      .union(eRaw.select(col("dst").as("node")))
      .union(sNorm.select("node"))
      .distinct()
      .join(sNorm, Seq("node"), "left")
      .na.fill(0.0, Seq("sw"))
      .join(outdeg, col("node") === col("od_src"), "left")
      .select(col("node"), col("sw"), col("od_src").isNull.as("is_sink"))) // hash(node)
    eRaw.unpersist(false)

    var ranks = Bridge.iterCheckpointKeyed(
      nodes.select(col("node"), col("sw"), col("is_sink"), col("sw").as("rank")))
    // same cadence as run(): lazy-persist odd iterations, one eager
    // checkpoint job per two
    var midFrame: Option[DataFrame] = None
    for (it <- 1 to iters) {
      // same one-job fold as run(): dangling rides the checkpoint action
      val dangling = ranks.where(col("is_sink"))
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      val contribs = ranks.where(!col("is_sink"))
        .join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("contrib"))
      val next = nodes
        .join(contribs, Seq("node"), "left")
        .na.fill(0.0, Seq("contrib"))
        .crossJoin(broadcast(dangling))
        .select(
          col("node"),
          col("sw"),
          col("is_sink"),
          (lit(1.0 - damping) * col("sw") +
            lit(damping) * (col("contrib") + col("dmass") * col("sw"))).as("rank"))
      if (it % 2 == 1 && it != iters) {
        ranks = next.persist()
        midFrame = Some(ranks)
      } else {
        ranks = Bridge.iterCheckpointKeyed(next)
        midFrame.foreach(_.unpersist(false)); midFrame = None
      }
    }
    ranks.select("node", "rank")
  }
}
