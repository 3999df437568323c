package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming compilation of the event operators
  * (SURVEY.md §2 S4): the same tumbling-window aggregate as
  * [[EventOps.hourlyAgg]], expressed with `window()` + a watermark so it
  * runs incrementally with bounded state on an unbounded stream.
  */
object EventStream {

  /** Streaming scan of an events parquet path. The file schema is taken
    * from a batch read (streaming sources need an explicit schema); the
    * nanosecond ts column is normalized exactly like the batch path.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema: StructType = spark.read.parquet(path).schema
    graft.util.Tables.normalizeTs(spark.readStream.schema(fileSchema).parquet(path))
  }

  /** Watermarked tumbling-window aggregate; append-safe output. */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("ws"),
        col("event_type"),
        col("n"),
        col("sum_value")
      )
}
