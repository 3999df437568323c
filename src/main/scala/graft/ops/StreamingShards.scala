package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.text.Bpe

/** The streaming end-cap: continuous ingest → training shards, composing
  * the stateless streaming BPE tokenization (S12) with the deterministic
  * bin packer (T10/T15) inside one `foreachBatch` sink.
  *
  * Per micro-batch: tokenize + chunk (broadcast vocab — a stateless
  * projection), pack THIS batch's chunks with the SAME [[Packing
  * .packBins]] rule the batch [[TrainingShards]] uses (salt extended
  * with the epoch id so each epoch has its own reproducible order), and
  * write under `(ingest_epoch, bin)` with dynamic partition overwrite —
  * the [[graft.sources.StreamingIngest]] idempotence pattern: a crash
  * between write and checkpoint commit replays the epoch into the SAME
  * partitions, never appending duplicates.
  *
  * Bin ids are EPOCH-SCOPED by design: a globally monotone bin counter
  * would need cross-epoch state read back from the sink, and a replayed
  * epoch would advance it twice — exactly the at-least-once trap the
  * epoch partitioning exists to close. Consumers address shards by
  * `(ingest_epoch, bin)`; within every epoch the bins obey the same
  * budget rule as the batch writer (StreamingSpec pins per-epoch parity
  * with [[TrainingShards.shards]] and cross-epoch completeness).
  */
object StreamingShards {

  /** Start the shard-append sink on a streaming `docs` frame; returns
    * the query (caller stops it).
    */
  def run(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      vocab: Bpe.Vocab,
      chunkSize: Int,
      overlap: Int,
      budget: Long,
      path: String,
      checkpoint: String,
      salt: String = "shards"
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val (out, chunks) = TrainingShards.shardsPlan(
          batch, textCol, idCol, vocab, chunkSize, overlap, budget, s"$salt-e$epoch")
        out
          .withColumn("ingest_epoch", lit(epoch))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("ingest_epoch", "bin")
          .parquet(path)
        chunks.unpersist(false)
        ()
      }
      .start()
}
