package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2 X1).
  *
  * Media are opaque `binary` payloads plus a typed metadata struct —
  * the Spark-side contract (schema, partition-friendly batch iteration,
  * feature output shape) is real and tested; the actual codec call is
  * STUBBED behind [[decodeStub]] with a deterministic fake because no
  * image/audio libraries exist in this container. Swapping in a real
  * decoder changes one function, not the pipeline.
  *
  * Scale shape: `mapPartitions` over a typed Dataset — the per-partition
  * iterator is exactly the batch boundary a vectorized decoder wants
  * (analogous to `mapInPandas` batches in PySpark); no driver collect,
  * no shuffle: decoding is embarrassingly parallel.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      payload: Array[Byte],
      width: Int,            // metadata the storage layer knows
      height: Int
  )

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      /** content hash of the raw payload — the exact-dedup key a real
        * media pipeline computes alongside decoding (hex md5, so the
        * driver's DuckDB oracle can recompute it with `md5(...)`)
        */
      content_md5: String,
      // deterministic fake "embedding" standing in for decoded features
      feature: Array[Float]
  )

  /** STUB decode: a real implementation would decode `payload` with an
    * image/audio codec and run feature extraction. The deterministic
    * fake hashes fixed-stride byte windows so tests can pin exact
    * values and the batch plumbing is exercised end to end.
    */
  def decodeStub(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) {
      var h = 1125899906842597L
      var j = i
      while (j < payload.length) {
        h = 31 * h + payload(j)
        j += dims
      }
      out(i) = (h % 1000L).toFloat / 1000f
      i += 1
    }
    out
  }

  /** Batch feature extraction over the binary payload column. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition setup is where a real codec would init once — the
      // digest instance is reused across the whole batch
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { m =>
        md.reset()
        val hex = md.digest(m.payload).map(b => f"$b%02x").mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length, hex, decodeStub(m.payload, dims))
      }
    }
  }

  /** Derive a media table from the documents table (the container has no
    * real media files): payload = utf-8 bytes. Exercises the exact
    * schema/partitioning path a real binary column takes.
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        col("text").cast("binary").as("payload"),
        lit(64).as("width"),
        lit(64).as("height")
      )
      .as[MediaRow]
  }
}
