package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}

/** Continuous file ingest: the streaming twin of [[Ingest]]. A crawl
  * lands shards into a directory forever; `readStream` on that
  * directory gives incremental discovery (only NEW files are read per
  * micro-batch) with exactly-once file tracking via the checkpoint's
  * file log, and the same PERMISSIVE corrupt-record quarantine — good
  * rows and quarantined raw lines land in separate parquet sinks from
  * ONE parse per record (`foreachBatch` splits each micro-batch).
  *
  * The sinks are idempotent per epoch: each micro-batch writes its rows
  * under an `ingest_epoch=<batchId>` partition with DYNAMIC partition
  * overwrite, so a crash between a write and the checkpoint commit
  * replays the batch into the SAME partition instead of appending
  * duplicates — end-to-end exactly-once, not just exactly-once file
  * discovery. (A plain `append` here would be at-least-once: the good
  * write can land, the quarantine write crash, and the restart re-append
  * both.)
  *
  * `maxFilesPerTrigger` bounds micro-batch size — at 100 TB the backlog
  * after downtime must stream through in bounded-memory chunks, not one
  * giant catch-up batch.
  */
object StreamingIngest {

  private val CorruptCol = "_corrupt_record"

  /** Start a JSONL→parquet ingest; returns the query (caller stops it).
    * Good rows → `goodPath`, unparseable raw lines → `quarantinePath`.
    */
  def runJsonl(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      goodPath: String,
      quarantinePath: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 100
  ): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(inputDir)
    writeSplit(raw, goodPath, quarantinePath, checkpoint)
  }

  /** CSV variant (headerless: a streamed directory has no single header
    * row; schema is the contract).
    */
  def runCsv(
      spark: SparkSession,
      inputDir: String,
      schema: StructType,
      goodPath: String,
      quarantinePath: String,
      checkpoint: String,
      maxFilesPerTrigger: Int = 100
  ): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(inputDir)
    writeSplit(raw, goodPath, quarantinePath, checkpoint)
  }

  private def writeSplit(
      raw: DataFrame,
      goodPath: String,
      quarantinePath: String,
      checkpoint: String
  ): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // per-epoch split: persist so good+quarantine share one parse
        // of the micro-batch, released before the epoch commits
        val cached = batch.persist()
        // idempotent sink: replaying batchId overwrites ONLY its own
        // ingest_epoch partition (dynamic mode), never other epochs
        def writeEpoch(df: DataFrame, path: String): Unit =
          df.withColumn("ingest_epoch", lit(batchId))
            .write
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_epoch")
            .parquet(path)
        writeEpoch(cached.where(col(CorruptCol).isNull).drop(CorruptCol), goodPath)
        writeEpoch(
          cached.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")),
          quarantinePath)
        cached.unpersist()
        ()
      }
      .start()
}
