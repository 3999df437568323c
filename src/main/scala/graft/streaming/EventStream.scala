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

  /** Custom stateful sessionization via flatMapGroupsWithState
    * (SURVEY.md §2 S4): per-user state carries the open session's
    * (index, count, sum, last event time) across micro-batches; events
    * in a batch are gap-split exactly like the batch
    * [[EventOps.sessionize]]. Sessions are emitted as soon as observed
    * (including the still-open one) — a production pipeline would emit
    * only on close via event-time timeout; this keeps single-batch
    * parity with the batch operator testable.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    case class SessState(session: Long, lastMs: Long)

    val typed = events
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms", "value")
      .as[(Long, Long, Long, Double)]

    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Double)](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout
      ) { (userId: Long, rows: Iterator[(Long, Long, Long, Double)], state: GroupState[(Long, Long)]) =>
        val sorted = rows.toSeq.sortBy(r => (r._3, r._2))
        var (session, lastMs) = state.getOption.getOrElse((0L, Long.MinValue))
        val bySession = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Double)]
        for ((_, _, tsMs, value) <- sorted) {
          if (lastMs == Long.MinValue || tsMs - lastMs > gapMs) session += 1
          lastMs = tsMs
          val (n, sum) = bySession.getOrElse(session, (0L, 0.0))
          bySession(session) = (n + 1, sum + value)
        }
        state.update((session, lastMs))
        bySession.iterator.map { case (s, (n, sum)) => (userId, s, n, sum) }
      }
      .toDF("user_id", "session", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
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
