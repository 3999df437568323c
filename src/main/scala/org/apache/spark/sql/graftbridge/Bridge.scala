package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column construction so
  * graft's custom Catalyst expressions can surface as `Column`s — the
  * same technique Spark-extension libraries use (a shim inside the
  * org.apache.spark.sql package namespace).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def aggColumn(f: AggregateFunction): Column =
    ExpressionUtils.column(f.toAggregateExpression(isDistinct = false))

  /** Rebuild a localCheckpoint'ed frame as a LogicalRDD leaf with NO
    * origin stats/constraints. `Dataset.localCheckpoint` deliberately
    * PRESERVES the source plan's statistics on its leaf; in a frame
    * loop where each iteration joins the previous iteration's
    * checkpoints, join size estimation MULTIPLIES those carried
    * sizeInBytes — the digit count compounds per iteration and
    * Catalyst's BigInt stats arithmetic (Karatsuba/Toom-Cook in
    * `SizeInBytesOnlyStatsPlanVisitor`) becomes the driver bottleneck
    * long before any job runs. Dropping origin stats resets each leaf
    * to `defaultSizeInBytes`, keeping every iteration's stats walk
    * constant-cost. No data movement — the same checkpointed RDD backs
    * the new leaf.
    */
  def freshLeaf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          ds.sparkSession,
          new LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering, lr.isStreaming,
            lr.stream)(ds.sparkSession, None, None))
      case _ => df
    }
  }

  /** [[iterCheckpoint]] that PRESERVES the checkpointed frame's hash
    * partitioning and intra-partition ordering on the rebuilt leaf.
    *
    * `Dataset.localCheckpoint`/`checkpoint` drop outputPartitioning/
    * outputOrdering whenever the executed plan is adaptive (Spark's
    * `LogicalRDD.fromDataset` skips the attribute rewrite under AQE),
    * so every iteration of a frame loop re-exchanges BOTH sides of
    * joins that are in fact co-partitioned. This helper re-reads the
    * TRUE layout from the plan that produced the checkpointed rows —
    * the AQE final physical plan, fixed by the time the checkpoint RDD
    * exists — rewrites its attributes positionally onto the new leaf
    * (exactly what fromDataset does in the non-AQE branch), and claims
    * nothing it cannot prove: only a HashPartitioning whose remapped
    * references all survive in the leaf output is kept, otherwise the
    * leaf stays UnknownPartitioning. Origin stats are dropped as in
    * [[freshLeaf]].
    */
  def iterCheckpointKeyed(df: org.apache.spark.sql.DataFrame, eager: Boolean = true)
      : org.apache.spark.sql.DataFrame =
    checkpointKeyedImpl(df, eager, keepStats = false)

  /** [[iterCheckpointKeyed]] for STATIC frames (edge lists, pair
    * tables, count frames consumed by every iteration but never
    * rebuilt from themselves): additionally injects the frame's REAL
    * materialized size (block-store bytes of the just-checkpointed
    * RDD) as the leaf statistics. Loop STATE frames must stay
    * stats-free (freshLeaf rationale — carried stats compound through
    * self-referencing iterations), but a static frame's size is a
    * fact, and without it a small edge/pair frame loses every
    * broadcast-join fast path it had when it was persist()ed
    * (InMemoryRelation reports accurate sizes; a stats-free leaf
    * reports defaultSizeInBytes = never-broadcast).
    */
  def staticCheckpointKeyed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    checkpointKeyedImpl(df, eager = true, keepStats = true)

  private def checkpointKeyedImpl(
      df: org.apache.spark.sql.DataFrame,
      eager: Boolean,
      keepStats: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeMap, AttributeSet}
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val exec = ds.queryExecution.executedPlan
    val ck = truncate(df, eager)
    val cds = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    cds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        // by now truncate() has executed the plan (even the lazy path
        // builds the RDD, which forces AQE's final plan), so this IS
        // the plan whose rows the checkpoint holds
        val finalPlan = exec match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        // fail fast instead of mis-joining (r12 advice): the attribute
        // remap below is POSITIONAL, and the claimed partitioning is
        // only physically true if the checkpoint RDD really is the
        // final plan's layout — any future change to truncate() that
        // broke either invariant would otherwise produce silently
        // wrong co-partitioned joins
        require(finalPlan.output.length == lr.output.length,
          s"checkpointKeyed: leaf arity ${lr.output.length} != plan arity " +
            s"${finalPlan.output.length} — truncate() no longer preserves the layout")
        val attrMap = AttributeMap(finalPlan.output.zip(lr.output))
        val outSet = AttributeSet(lr.output)
        // any expression-bearing partitioning (HashPartitioning, its
        // AQE-coalesced variant, RangePartitioning) remaps; opaque ones
        // stay at the leaf's default (Unknown)
        val part = finalPlan.outputPartitioning match {
          case ep: org.apache.spark.sql.catalyst.expressions.Expression
              with org.apache.spark.sql.catalyst.plans.physical.Partitioning
              // the claim is only physically meaningful when the
              // checkpoint RDD kept the executed plan's partition count
              if ep.numPartitions == lr.rdd.getNumPartitions =>
            val r = ep.transform { case a: Attribute => attrMap.getOrElse(a, a) }
            if (r.references.subsetOf(outSet))
              r.asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.Partitioning]
            else lr.outputPartitioning
          case _ => lr.outputPartitioning
        }
        val ordRemapped = finalPlan.outputOrdering
          .map(so => so.transform { case a: Attribute => attrMap.getOrElse(a, a) }
            .asInstanceOf[org.apache.spark.sql.catalyst.expressions.SortOrder])
        val ord =
          if (ordRemapped.nonEmpty && ordRemapped.forall(_.references.subsetOf(outSet)))
            ordRemapped
          else Nil
        // static frames: exact materialized bytes from the block store.
        // The AppStatusStore is fed by an ASYNC listener bus, so the
        // sizes can lag the eager action by a beat (r12 advice: a miss
        // silently degraded the leaf to stats-free = never-broadcast,
        // nondeterministically); poll briefly for the blocks to appear
        // before giving up. Reliable-checkpoint mode stores no blocks
        // in the block store — it stays stats-free by construction.
        def blockBytes(): Option[Long] = ds.sparkSession.sparkContext.getRDDStorageInfo
          .find(_.id == lr.rdd.id)
          .map(i => i.memSize + i.diskSize)
          .filter(_ > 0L)
        val stats =
          if (!keepStats) None
          else {
            var bytes = blockBytes()
            var waited = 0
            while (bytes.isEmpty && waited < 20
                && lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) {
              Thread.sleep(50); waited += 1
              bytes = blockBytes()
            }
            bytes.map(s => org.apache.spark.sql.catalyst.plans.logical.Statistics(
              sizeInBytes = BigInt(s)))
          }
        org.apache.spark.sql.classic.Dataset.ofRows(
          ds.sparkSession,
          new LogicalRDD(lr.output, lr.rdd, part, ord, lr.isStreaming, lr.stream)(
            ds.sparkSession, stats, None))
      case _ => ck
    }
  }

  /** Release every checkpoint block reachable from `df`'s plan: the
    * library-caller release handle (r12 advice) for frames built over
    * [[iterCheckpointKeyed]]/[[staticCheckpointKeyed]] leaves — e.g.
    * MarketBasket's pinned basket frame, the graph loops' static edge
    * copies. The Bench/Verify harness sweeps persistent RDDs between
    * queries; callers outside it invoke this once the returned frame's
    * contents are no longer needed (the frame is NOT usable after).
    */
  def releaseCheckpoints(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))

  /** Conf key selecting DURABLE iteration checkpoints. `localCheckpoint`
    * stores blocks on EXECUTOR storage only: on a real multi-executor
    * cluster, losing one executor mid-loop (iteration 40 of PageRank)
    * loses blocks whose lineage was truncated — the job dies. Set this
    * key to "true" (and a checkpoint dir via
    * `spark.sparkContext.setCheckpointDir`) and every loop that
    * truncates through [[iterCheckpoint]] switches to reliable
    * `checkpoint()` — same values, same plans, storage on the fault-
    * tolerant checkpoint FS. Default remains localCheckpoint: right for
    * local[N] and short loops, no distributed FS round-trips.
    */
  val ReliableCheckpointsKey = "spark.graft.checkpoint.reliable"

  /** The library-wide iteration-loop truncation point: localCheckpoint
    * (default) or reliable checkpoint ([[ReliableCheckpointsKey]]),
    * then [[freshLeaf]] so iterated joins don't compound origin stats.
    * `eager` matters identically in both modes (materialize now vs on
    * first action).
    */
  def iterCheckpoint(df: org.apache.spark.sql.DataFrame, eager: Boolean = true)
      : org.apache.spark.sql.DataFrame =
    freshLeaf(truncate(df, eager))

  /** Plan-capture hook for iteration-loop frames (measurement only):
    * with GRAFT_EXPLAIN_ITER=1 every frame passing through [[truncate]]
    * — and the explicit call sites in loops that checkpoint directly —
    * prints its formatted physical plan before truncation hides it
    * behind a LogicalRDD leaf. Off (zero cost) unless the env var is
    * set; used to produce plans/r12/\*_before|after.txt.
    */
  def explainIter(df: org.apache.spark.sql.DataFrame, label: String): Unit =
    if (sys.env.contains("GRAFT_EXPLAIN_ITER")) {
      println(s"---------- iter-plan: $label ----------")
      df.explain("formatted")
    }

  /** Mode-aware truncation WITHOUT the freshLeaf stats reset — for loops
    * that manage origin stats another way (FixedEffects rides the probe
    * cadence).
    */
  def truncate(df: org.apache.spark.sql.DataFrame, eager: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    explainIter(df, "truncate")
    val spark = df.sparkSession
    val reliable =
      spark.conf.get(ReliableCheckpointsKey, "false").equalsIgnoreCase("true")
    if (reliable) {
      require(
        spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableCheckpointsKey=true needs spark.sparkContext.setCheckpointDir " +
          "(a fault-tolerant FS path) before the first loop runs")
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
  }

  /** Register a temp SQL function on an EXISTING session (the extension
    * path only covers sessions built with `spark.sql.extensions`).
    */
  def registerTempFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
