package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh
import graft.util.Tables

/** Stage-by-stage timing of the blocked n-gram Jaccard join (q23). */
object JaccMicro {
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
    t("docs")(docs.count())
    val sets = MinHashLsh
      .shingleSets(docs, "text", "doc_id", 2)
      .join(docs.select(col("doc_id"), col("source").as("block")), Seq("doc_id"))
      .select(col("block"), col("doc_id"), col("sh_set").as("ngrams"))
      .persist()
    t("sets")(sets.count())
    val l = sets.select(col("block"), col("doc_id").as("id_a"), col("ngrams").as("ng_a"))
    val r = sets.select(col("block"), col("doc_id").as("id_b"), col("ngrams").as("ng_b"))
    val joined = l.join(r, Seq("block")).where(col("id_a") < col("id_b"))
    t("join only")(joined.count())
    val inter = joined.withColumn(
      "inter",
      graft.functions.SetOps.sortedIntersectSize(col("ng_a"), col("ng_b")).cast("double"))
    t("join+intersect")(inter.select(sum(col("inter"))).head().getDouble(0))
    val jac = inter
      .withColumn(
        "jaccard",
        round(col("inter") / (size(col("ng_a")) + size(col("ng_b")) - col("inter")), 4))
      .where(col("jaccard") > 0.0)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
    t("=+jaccard+filter count")(jac.count())
    t("=+localCheckpoint")(jac.localCheckpoint().count())
    t("full similarityJoin")(
      graft.dedup.NGramJaccard
        .similarityJoin(docs, "text", "doc_id", "source", n = 2)
        .where(col("jaccard") > 0.0)
        .count())
    spark.stop()
  }
}
