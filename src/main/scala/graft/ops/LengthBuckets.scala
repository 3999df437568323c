package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Length-bucketed batch assignment for padding-efficient training —
  * SURVEY.md §2 T28.
  *
  * Sequence batches pad every row to the batch max, so batching
  * length-sorted neighbors (bucketing by length, then fixed-size
  * batches within a bucket) is the standard way to cut padding waste
  * (the `--group_by_length` / length-grouped sampler idiom). This
  * operator makes the assignment DETERMINISTIC and auditable: each
  * document gets (bucket, shard, batch_idx) and its padding cost, so
  * the writer (T15 training shards) can lay batches out contiguously
  * and the waste is measurable before a single GPU-hour is spent.
  *
  * Scale shape: bucket bounds are a fixed power-of-two CASE ladder
  * (integer comparisons — no float log2, so engines agree at exact
  * powers); rows are salted into `nShards` shards so the within-bucket
  * row_number windows parallelize — the window partition key is
  * (bucket, shard), giving nBuckets × nShards independent partitions
  * instead of one sequential scan per bucket. At 100 TB nShards scales
  * with the cluster and each window partition stays executor-sized.
  * Complements T10 (greedy sequence packing): packing concatenates to
  * fill a context window, bucketing batches same-length rows.
  */
object LengthBuckets {

  val Bounds: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024, 4096)

  /** Assign (bucket, shard, batch_idx, pad) per document.
    *
    * bucket = smallest power-of-two bound ≥ n_tokens; shard =
    * id mod nShards; batch_idx = 0-based index of fixed-size batches in
    * (bucket, shard) ordered by id; batch_max = max n_tokens in the
    * batch; pad = batch_max − n_tokens.
    */
  def assign(
      df: DataFrame,
      textCol: String,
      idCol: String,
      batchSize: Int = 8,
      nShards: Int = 4
  ): DataFrame = {
    val nTok = size(split(col(textCol), " "))
    val bucket = Bounds.foldRight(lit(Bounds.last)) { (b, acc) =>
      when(nTok <= b, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy("bucket", "shard").orderBy(col(idCol))
    val batched = df
      .select(
        col(idCol),
        nTok.as("n_tokens"),
        bucket.as("bucket"),
        pmod(col(idCol), lit(nShards)).cast("int").as("shard")
      )
      .withColumn("batch_idx", ((row_number().over(w) - 1) / batchSize).cast("int"))
    val wb = Window.partitionBy("bucket", "shard", "batch_idx")
    batched
      .withColumn("batch_max", max(col("n_tokens")).over(wb))
      .withColumn("pad", col("batch_max") - col("n_tokens"))
  }

  /** Waste accounting per bucket: documents, batches, real vs padded
    * token volume, and the padding fraction the bucketing leaves.
    */
  def waste(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("shard") * 1000000 + col("batch_idx")).as("n_batches"),
        sum("n_tokens").as("sum_tokens"),
        sum(col("n_tokens") + col("pad")).as("padded_tokens")
      )
      .withColumn(
        "waste_frac",
        round(lit(1.0) - col("sum_tokens").cast("double") / col("padded_tokens"), 4)
      )
}
