package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver's test star schema (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spark 4 rejects parquet TIMESTAMP(NANOS) unless it is read as a
    * long; convert that long back to a microsecond TimestampType (the
    * same truncation DuckDB's epoch functions apply).
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    if (df.schema.fieldNames.contains(tsCol) && df.schema(tsCol).dataType == LongType)
      df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
    else df

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
