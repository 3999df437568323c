package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the materialized-view pattern for
  * append-only corpora: keep a per-key state table of MERGEABLE
  * aggregates (count, sum, sum-of-squares, min, max) and fold each new
  * partition in with one pass over the DELTA plus a state-sized merge.
  * Maintaining a 100 TB corpus dashboard then never recomputes: day N
  * costs O(day-N data + #keys), not O(corpus). Derived statistics
  * (mean, variance) are closed forms over the state columns, computed
  * at READ time so the state stays mergeable.
  */
object Rollup {

  /** One state row per key: n, s, sq, mn, mx. */
  def aggregate(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("s"),
        sum(v * v).as("sq"),
        min(v).as("mn"),
        max(v).as("mx"))
  }

  /** Merge two state frames: counts/sums add, min/max combine. */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum("n").as("n"), sum("s").as("s"), sum("sq").as("sq"),
        min("mn").as("mn"), max("mx").as("mx"))

  /** Read-time derived view: mean and sample variance from the state. */
  def withStats(state: DataFrame): DataFrame =
    state
      .withColumn("mean", col("s") / col("n").cast("double"))
      .withColumn(
        "variance",
        when(col("n") > 1,
          (col("sq") - col("s") * col("s") / col("n").cast("double")) /
            (col("n") - 1).cast("double"))
          .otherwise(lit(null)))

  /** Fold `newData` into the state table at `statePath` (created on
    * first call). Write is staged to `<statePath>__staging` and swapped
    * in, so a crashed maintenance run leaves the old state readable
    * rather than half-overwritten.
    */
  def maintain(
      spark: SparkSession,
      statePath: String,
      newData: DataFrame,
      keys: Seq[String],
      valueCol: String
  ): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(statePath)
    val fs = p.getFileSystem(conf)
    val delta = aggregate(newData, keys, valueCol)
    val merged =
      if (fs.exists(p)) merge(spark.read.parquet(statePath), delta, keys)
      else delta
    val staging = new Path(statePath + "__staging")
    merged.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val old = new Path(statePath + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(p)) fs.rename(p, old)
    fs.rename(staging, p)
    fs.delete(old, true)
  }
}
