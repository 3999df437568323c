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

  /** Mode-aware truncation WITHOUT the freshLeaf stats reset — for loops
    * that manage origin stats another way (FixedEffects rides the probe
    * cadence).
    */
  def truncate(df: org.apache.spark.sql.DataFrame, eager: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
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
