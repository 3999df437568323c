package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SharedHash

/** Token-budget mix selection — the "compose a training mix" end-cap:
  * given per-source token budgets, keep each source's documents in
  * deterministic hash order until the budget is exhausted. The
  * selection is EXACT (a document is kept iff its running token total,
  * in (hash, id) order within its source, stays ≤ the budget) yet no
  * source-wide ordered scan ever runs:
  *
  *  1. the cross-engine order key h = md5-60([[SharedHash]]) is split
  *     into `buckets` RANGE prefixes (top bits, so bucket order ==
  *     hash order);
  *  2. one groupBy pass takes per-(source, bucket) token masses —
  *     #sources × buckets rows, driver-bounded — and an exclusive
  *     prefix sum over buckets broadcasts back;
  *  3. the running total inside each bucket is a window over a
  *     (source, bucket) partition: ~1/buckets of the source by the
  *     hash's uniformity, so partitions stay task-sized at any corpus
  *     scale — the classic two-level prefix-sum, not a single-task
  *     per-source sort.
  *
  * Budgets are TOKEN budgets (the unit training mixes are specified
  * in), not document counts — [[Sampling]] handles the count-shaped
  * draws. Sources absent from `budgets` are dropped. Determinism: the
  * (h, id) order is a pure function of ids, so the same corpus and
  * budgets always select the same mix — and DuckDB replays the whole
  * selection, running totals included, from the shared hash.
  */
object TokenBudget {

  def select(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokensCol: String,
      budgets: Map[String, Long],
      buckets: Int = 4096,
      salt: String = "graft"
  ): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    require(budgets.nonEmpty, "no budgets: everything would be dropped")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    val spark = df.sparkSession
    import spark.implicits._

    val budgeted = df
      .join(broadcast(budgets.toSeq.toDF(sourceCol, "__budget")), Seq(sourceCol))
      .withColumn("__h", SharedHash.md5Long60(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
      .withColumn("__bucket", shiftright(col("__h"), shift))

    // per-(source, bucket) masses → exclusive bucket prefix, driver-side
    val masses = budgeted
      .groupBy(col(sourceCol), col("__bucket"))
      .agg(sum(col(tokensCol).cast("long")).as("__mass"))
      .as[(String, Long, Long)]
      .collect()
    val prefix = masses
      .groupBy(_._1)
      .iterator
      .flatMap { case (src, rows) =>
        var run = 0L
        rows.sortBy(_._2).map { case (_, b, m) =>
          val p = run; run += m; (src, b, p)
        }
      }
      .toSeq
      .toDF(sourceCol, "__bucket", "__prefix")

    val win = Window
      .partitionBy(col(sourceCol), col("__bucket"))
      .orderBy(col("__h"), col(idCol))
    budgeted
      .join(broadcast(prefix), Seq(sourceCol, "__bucket"))
      .withColumn(
        "cum_tokens",
        col("__prefix") + sum(col(tokensCol).cast("long")).over(win))
      .where(col("cum_tokens") <= col("__budget"))
      .drop("__h", "__bucket", "__prefix", "__budget")
  }
}
