package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh
import graft.util.Tables

/** Stage-by-stage timing of the span-dedup pipeline (perf diagnosis).
  * Usage: runMain graft.tools.SpanMicro [sfDir]
  */
object SpanMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[micro] $name: ${(System.nanoTime - t0) / 1e9}%.1fs -> $r")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())
    val grams = MinHashLsh.shingleHashes(docs, "text", "doc_id", 8)
    t("shingleHashes")(grams.count())
    val gp = grams.persist()
    t("grams.persist+count")(gp.count())
    val owners = gp.groupBy(col("sh")).agg(min(col("doc_id")).as("owner"), count(lit(1)).as("ndocs"))
    t("owners")(owners.count())
    val joined = gp
      .join(owners, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("ndocs") > 1, 1).otherwise(0)).as("n_shared"),
        sum(when(col("owner") < col("doc_id"), 1).otherwise(0)).as("n_foreign"))
    t("join+agg")(joined.count())
    t("join+agg warm")(joined.count())
    t("localCheckpoint")(joined.localCheckpoint().count())
    t("full spanStats")(graft.dedup.SpanDedup.spanStats(docs, "text", "doc_id", 8).count())
    spark.stop()
  }
}
