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
    val marked = markedBySortKey(df, sortCols, numPartitions)
    val counts = marked
      .groupBy("__pid")
      .agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    (marked, counts)
  }

  /** [[partitionedBySortKey]] minus the per-partition row-count collect —
    * for consumers ([[withPrefixSums]]) whose carry comes from a
    * different P-row aggregate anyway. One fewer driver job per pass;
    * matters for iterative callers (Cox runs one pass per Newton step).
    */
  private def markedBySortKey(
      df: DataFrame,
      sortCols: Seq[Column],
      numPartitions: Int): DataFrame = {
    require(sortCols.nonEmpty, "Rank: need at least one sort column")
    val p =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val cp = Bridge.freshLeaf(sorted.localCheckpoint())
    cp
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
      .withColumn("__local", col("__mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__mid")
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

  /** Adds, for every `terms` column, `__cum_<t>` = the exact INCLUSIVE
    * prefix sum over the `sortCols` global order and `__tot_<t>` = the
    * grand total (a driver-known literal) — all computed distributed:
    * one range exchange + per-partition windows (`Window.partitionBy
    * (__pid)` — P-way parallel) + a P-row collected carry, never a
    * single-partition WindowExec. Suffix sums come free as
    * `__tot − __cum + value` (suffix-inclusive), which is how the
    * Survival/Cox family gets its at-risk counts without a second
    * (descending) pass. Terms listed in `exclusive` ALSO get
    * `__excl_<t>` = the exclusive prefix (sum strictly before the row)
    * accumulated in the same order — NOT derived as `__cum − value`,
    * whose float regrouping can land on the other side of a downstream
    * quantization boundary from a genuinely-exclusive window sum.
    *
    * CONTRACT: `sortCols` must be a TOTAL order — i.e. the sort keys
    * must be DISTINCT per row (every current caller pre-aggregates to
    * one row per key before scanning). With tied keys the rowsBetween
    * accumulation order among the ties is whatever order the shuffle
    * delivered, so per-row `__cum` values on and between tied rows are
    * run-dependent. Callers that cannot guarantee distinct keys must
    * either add a tie-break column to `sortCols` (deterministic but
    * arbitrary within the tie) or pre-aggregate.
    *
    * Integral terms accumulate in Long end-to-end (bit-exact);
    * everything else in Double. Double prefix sums can differ from a
    * strictly-sequential fold in the last ulps (the carry regroups
    * additions at partition boundaries) — consumers quantize with the
    * house 6dp floor-quantizer, same contract as every other float
    * column in the oracle suite.
    */
  def withPrefixSums(
      df: DataFrame,
      sortCols: Seq[Column],
      terms: Seq[String],
      numPartitions: Int = 0,
      exclusive: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types._
    require(terms.nonEmpty, "Rank.withPrefixSums: need at least one term")
    val marked = markedBySortKey(df, sortCols, numPartitions)
    val integral: Map[String, Boolean] = terms.map { t =>
      t -> (marked.schema(t).dataType match {
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      })
    }.toMap
    val aggs = terms.map { t =>
      (if (integral(t)) sum(col(t).cast("long")) else sum(col(t).cast("double"))).as(t)
    }
    val totRows = marked
      .groupBy("__pid")
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .sortBy(_.getAs[Int]("__pid"))
    // driver exclusive prefix over the ascending-pid partition totals.
    // NOTE the explicit `: Any` ascriptions: a bare `if (b) 0L else 0.0`
    // unifies both branches to Double (Scala numeric widening), silently
    // boxing the Long accumulator as a Double.
    var acc: Map[String, Any] =
      terms.map { t =>
        val zero: Any = if (integral(t)) 0L else 0.0
        t -> zero
      }.toMap
    val carryRows = totRows.map { r =>
      val row = Row.fromSeq(r.getAs[Int]("__pid") +: terms.map(acc(_)))
      acc = terms.map { t =>
        val v = r.get(r.fieldIndex(t))
        val nxt: Any =
          if (integral(t))
            acc(t).asInstanceOf[Long] + (if (v == null) 0L else v.asInstanceOf[Long])
          else
            acc(t).asInstanceOf[Double] + (if (v == null) 0.0 else v.asInstanceOf[Double])
        t -> nxt
      }.toMap
      row
    }
    val carrySchema = StructType(
      StructField("__pid", IntegerType, nullable = false) +:
        terms.map(t => StructField("__carry_" + t,
          if (integral(t)) LongType else DoubleType, nullable = false)))
    val spark = df.sparkSession
    val carry = spark.createDataFrame(
      spark.sparkContext.parallelize(carryRows.toSeq, 1), carrySchema)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    var out = marked.join(broadcast(carry), Seq("__pid"))
    terms.foreach { t =>
      val cast = if (integral(t)) "long" else "double"
      out = out
        .withColumn("__cum_" + t, col("__carry_" + t) + sum(col(t).cast(cast)).over(w))
      if (exclusive.contains(t)) {
        val zero = if (integral(t)) lit(0L) else lit(0.0)
        out = out.withColumn(
          "__excl_" + t,
          col("__carry_" + t) + coalesce(sum(col(t).cast(cast)).over(wExcl), zero))
      }
      out = out
        .withColumn("__tot_" + t,
          if (integral(t)) lit(acc(t).asInstanceOf[Long])
          else lit(acc(t).asInstanceOf[Double]))
        .drop("__carry_" + t)
    }
    out.drop("__pid", "__local")
  }
}
