package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced text-format ingest with corrupt-record quarantine.
  * At crawl scale some fraction of every JSONL/CSV shard is malformed;
  * FAILFAST kills the job and DROPMALFORMED silently loses data —
  * neither is acceptable for a 100 TB training-data ingest. PERMISSIVE
  * mode parses what it can and lands unparseable lines in a corrupt-
  * record column; this wrapper splits the scan into (good rows with the
  * declared schema, quarantined raw lines for forensics/reprocessing).
  *
  * The raw frame is cached: Spark refuses to filter on ONLY the
  * internal corrupt-record column of a live JSON/CSV scan, and the
  * cache also means good+quarantine consume one parse. Call the
  * returned `release()` after both sides are written.
  */
object Ingest {

  final case class Split(good: DataFrame, quarantine: DataFrame, release: () => Unit)

  private val CorruptCol = "_corrupt_record"

  private def split(raw: DataFrame): Split = {
    val cached = raw.cache()
    Split(
      good = cached.where(col(CorruptCol).isNull).drop(CorruptCol),
      quarantine = cached.where(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")),
      release = () => { cached.unpersist(); () }
    )
  }

  def readJsonl(spark: SparkSession, path: String, schema: StructType): Split =
    split(
      spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .json(path))

  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true
  ): Split =
    split(
      spark.read
        .schema(schema.add(CorruptCol, StringType))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CorruptCol)
        .option("header", header.toString)
        .csv(path))
}
