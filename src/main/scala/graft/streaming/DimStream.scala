package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Scd2

/** Continuous SCD Type-2 dimension maintenance — the streaming form of
  * [[graft.sources.Scd2]]: a stream of attribute updates folds into the
  * versioned dimension table per micro-batch inside `foreachBatch`.
  *
  * Idempotence under at-least-once replay comes from TWO layers:
  *
  *   1. `Scd2.merge` is a no-op for updates whose tracked values match
  *      the current version — a replayed epoch whose merge already
  *      committed re-applies identical values and changes NOTHING (no
  *      duplicate versions; the spec pins it).
  *   2. The dimension write is staged-and-swapped (the [[graft.sources
  *      .Rollup]] pattern): a crash mid-write leaves the previous state
  *      readable, never a half-overwritten table.
  *
  * Within one micro-batch, multiple updates for the same key collapse
  * to the LATEST by (effCol, tracked...) — a deterministic total order,
  * because `Scd2.merge` (correctly) refuses ambiguous duplicate-key
  * batches. Cross-batch ordering is the stream's event order, as with
  * any SCD feed.
  */
object DimStream {

  /** One row per key: the last update by (effCol desc, tracked desc). */
  private[streaming] def latestPerKey(
      batch: DataFrame,
      key: String,
      tracked: Seq[String],
      effCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy((col(effCol).desc +: tracked.map(col(_).desc)): _*)
    batch
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Start the SCD2 maintenance sink. The dimension at `dimPath` must
    * exist (seed it with `Scd2.initial(...).write`); returns the query
    * (caller stops it).
    */
  def scd2Sink(
      updates: DataFrame,
      dimPath: String,
      key: String,
      tracked: Seq[String],
      effCol: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val dedup = latestPerKey(batch, key, tracked, effCol)
        // crash recovery for the two-rename swap below: a crash BETWEEN
        // rename(p, old) and rename(staging, p) leaves no table at
        // dimPath but an intact __old — roll it back before merging so
        // the read below always sees the previous committed state
        // (idempotence layer 1 re-applies the interrupted epoch)
        locally {
          val conf0 = spark.sparkContext.hadoopConfiguration
          val p0 = new Path(dimPath)
          val fs0 = p0.getFileSystem(conf0)
          val old0 = new Path(dimPath + "__old")
          if (!fs0.exists(p0) && fs0.exists(old0)) fs0.rename(old0, p0)
        }
        val dim = spark.read.parquet(dimPath)
        val merged = Scd2.merge(dim, dedup, key, tracked, effCol)
          // the merge plan reads dimPath lazily; materialize BEFORE the
          // swap below deletes the files it reads
          .localCheckpoint(true)
        val conf = spark.sparkContext.hadoopConfiguration
        val p = new Path(dimPath)
        val fs = p.getFileSystem(conf)
        val staging = new Path(dimPath + "__staging")
        merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        val old = new Path(dimPath + "__old")
        if (fs.exists(old)) fs.delete(old, true)
        fs.rename(p, old)
        fs.rename(staging, p)
        fs.delete(old, true)
        ()
      }
      .start()
}
