package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Exact GLOBAL rank / row_number / ntile without the single-partition
  * WindowExec. Spark's `Window.orderBy(...)` with no partition spec moves
  * EVERY row to ONE task — fine on an experiment-sized frame, fatal on a
  * corpus. This utility computes the identical numbers distributed:
  *
  *  1. `repartitionByRange` on the sort key — partition i holds keys ≤
  *     partition i+1's (the range exchange IS the global sort's first
  *     phase, P-way parallel),
  *  2. `sortWithinPartitions` + `localCheckpoint` pins each partition's
  *     row order (one materialization; `Bridge.freshLeaf` drops origin
  *     stats so downstream loops stay constant-cost),
  *  3. `monotonically_increasing_id` arithmetic — pid in the upper bits,
  *     within-partition index in the lower 33 — yields the LOCAL row
  *     number with NO window and NO second shuffle,
  *  4. per-partition counts (a P-row aggregate, collected) become
  *     broadcast offsets; global row_number = offset(pid) + local + 1.
  *
  * Ranks are exact and deterministic given a total order (pass a unique
  * tie-break column, same as any row_number). For min-rank (`rank()`)
  * and ntile semantics see [[withGlobalMinRank]] / [[withGlobalNtile]] —
  * both derive from the row number in closed form, so DuckDB replays
  * them bit-for-bit.
  *
  * The same machinery serves distributed PREFIX scans (cumulative sums,
  * last-non-null carry): [[partitionedBySortKey]] exposes the pid column
  * so callers run per-partition windows (`Window.partitionBy(__pid)` —
  * P-way parallel, never single-partition) and add per-partition
  * carry-ins computed from a P-row collected summary. Consumers:
  * [[Stats.rfm]], [[Calibrate.quantileMap]], [[graft.ml.Causal.nnMatch]],
  * [[Abtest.msprt]], [[Drift.psi]].
  */
object Rank {

  /** Range-partitioned + within-partition-sorted + checkpointed frame
    * with `__pid` (ascending = ascending key ranges) and `__local`
    * (0-based row index inside the partition), plus the ascending-pid
    * partition row counts (P entries, driver-bounded by the partition
    * count). Input columns pass through untouched.
    */
  def partitionedBySortKey(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int = 0): (DataFrame, Array[(Int, Long)]) = {
    require(sortCols.nonEmpty, "Rank: need at least one sort column")
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val cp = Bridge.freshLeaf(sorted.localCheckpoint())
    val marked = cp
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__mid")
    val counts = marked
      .groupBy("__pid")
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    (marked, counts)
  }

  /** Exclusive prefix offsets per pid as a broadcastable (P-row) frame. */
  private def offsetsFrame(df: DataFrame, counts: Array[(Int, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var acc = 0L
    val rows = counts.map { case (pid, n) => val o = acc; acc += n; (pid, o) }.toSeq
    rows.toDF("__pid", "__offset")
  }

  /** Adds `out` = exact global row_number over `sortCols` (1-based,
    * long). No WindowExec anywhere in the lineage — one range exchange,
    * one checkpoint, one P-row aggregate, one broadcast join.
    */
  def withGlobalRowNumber(
      df: DataFrame,
      out: String,
      sortCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val (marked, counts) = partitionedBySortKey(df, sortCols, numPartitions)
    marked
      .join(broadcast(offsetsFrame(marked, counts)), Seq("__pid"))
      .withColumn(out, col("__offset") + col("__local") + lit(1L))
      .drop("__pid", "__local", "__offset")
  }

  /** [[withGlobalRowNumber]] but KEEPING the `__pid` column — for
    * callers that follow the row number with a per-partition prefix
    * scan + broadcast carry (the distributed running-max/cumsum shape;
    * consumer: [[graft.ml.Diagnostics.holm]]).
    */
  def withGlobalRowNumberAndPid(
      df: DataFrame,
      out: String,
      sortCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    val (marked, counts) = partitionedBySortKey(df, sortCols, numPartitions)
    marked
      .join(broadcast(offsetsFrame(marked, counts)), Seq("__pid"))
      .withColumn(out, col("__offset") + col("__local") + lit(1L))
      .drop("__local", "__offset")
  }

  /** Adds `out` = `rank()` (min-rank: ties share the rank of their first
    * row) over `valueCols`. Built as a total-order row_number with
    * `tieCols` breaking ties, then `min` over the value-keyed hash
    * window — hash-partitioned by value, never single-partition.
    */
  def withGlobalMinRank(
      df: DataFrame,
      out: String,
      valueCols: Seq[Column],
      tieCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    withGlobalRowNumber(df, "__rn_minrank", valueCols ++ tieCols, numPartitions)
      .withColumn(out, min(col("__rn_minrank")).over(Window.partitionBy(valueCols: _*)))
      .drop("__rn_minrank")
  }

  /** Adds `out` = `ntile(buckets)` over the `sortCols` total order —
    * the SQL-standard assignment (first n mod k buckets get ⌈n/k⌉
    * rows), identical to Spark's and DuckDB's ntile, derived in closed
    * form from the global row number: integer arithmetic only.
    * Output is int, matching Spark's ntile.
    */
  def withGlobalNtile(
      df: DataFrame,
      out: String,
      buckets: Int,
      sortCols: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(buckets > 0, "Rank.withGlobalNtile: buckets must be positive")
    val (marked, counts) = partitionedBySortKey(df, sortCols, numPartitions)
    val n = counts.map(_._2).sum
    val q = n / buckets
    val r = n % buckets
    val joined = marked
      .join(broadcast(offsetsFrame(marked, counts)), Seq("__pid"))
      .withColumn("__gn", col("__offset") + col("__local") + lit(1L))
    // `div`, not `/`: Spark's / on longs is DOUBLE division; the bucket
    // boundary must be exact integer arithmetic like both engines' ntile
    val bucket =
      if (q == 0L) col("__gn") // fewer rows than buckets: row i is bucket i
      else
        when(col("__gn") <= lit(r * (q + 1)), expr(s"(__gn - 1) div ${q + 1} + 1"))
          .otherwise(expr(s"$r + (__gn - ${r * (q + 1)} - 1) div $q + 1"))
    joined
      .withColumn(out, bucket.cast("int"))
      .drop("__pid", "__local", "__offset", "__gn")
  }
}
