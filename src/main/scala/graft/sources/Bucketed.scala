package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed parquet tables: the storage-layout half of the 100 TB join
  * strategy (SURVEY.md §5). Writing both sides of a recurring join
  * bucketed (and optionally sorted) BY THE JOIN KEY with the same bucket
  * count lets Spark satisfy the join's required distribution straight
  * from the scan — a sort-merge join with NO Exchange on either side.
  * At 100 TB that turns the single most expensive recurring shuffle
  * (fact ⋈ fact co-partitioned joins, e.g. events ⋈ sessions) into a
  * scan-local operation; the shuffle is paid once at write time and
  * amortized over every subsequent join, aggregation, or incremental
  * append that reuses the layout.
  *
  * Bucketing requires the table catalog (bucket metadata lives there),
  * so these are `saveAsTable` managed tables, not bare paths.
  */
object Bucketed {

  /** Write `df` as a parquet table bucketed (and sorted) by `key`.
    * `buckets` should be sized so one bucket ≈ one executor-core task
    * at the target scale (e.g. 100 TB / 128 MB ≈ 800k splits → use
    * thousands of buckets, not dozens).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sorted: Boolean = true
  ): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Read a bucketed table (bucket metadata comes from the catalog). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Inner-join two tables bucketed on `key` with equal bucket counts.
    * The physical plan must contain no Exchange — verified by
    * `SourcesSpec`. Falls back to a normal shuffled join (correct, just
    * slower) if the layouts don't line up.
    */
  def cogroupedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String
  ): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
