package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loader for the driver's test star schema (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spark 4 rejects parquet TIMESTAMP(NANOS) unless it is read as a
    * long; convert that long back to a microsecond TimestampType (the
    * same truncation DuckDB's epoch functions apply). A timezone-less
    * parquet TIMESTAMP (isAdjustedToUTC = false — what the generator
    * emits since r8) infers as TIMESTAMP_NTZ, which event-time
    * watermarks reject; cast it to TimestampType — under the UTC
    * session every wall-clock value is preserved, so batch results and
    * the DuckDB oracle (which reads the same naive values) are
    * untouched.
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (!df.schema.fieldNames.contains(tsCol)) df
    else
      df.schema(tsCol).dataType match {
        case LongType => df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
        case TimestampNTZType => df.withColumn(tsCol, col(tsCol).cast("timestamp"))
        case _ => df
      }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, sfDir, "events"))
  }
  /** documents/embeddings ship as ONE parquet file per sf — Spark would
    * plan a single partition and per-document CPU-heavy operators
    * (shingling, minhash, cosine) would run on one core. Real corpora
    * arrive in thousands of splits; emulate that with a repartition so
    * the plan shape matches the 100 TB layout.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents").repartition(spark.sparkContext.defaultParallelism)
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "embeddings").repartition(spark.sparkContext.defaultParallelism)
}
