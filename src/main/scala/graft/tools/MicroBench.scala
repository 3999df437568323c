package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dedup.MinHashLsh
import graft.util.Tables

/** Stage-by-stage timing of the minhash pipeline (perf diagnosis).
  * Usage: runMain graft.tools.MicroBench [sfDir]
  */
object MicroBench {
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

    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())
    t("explode only")(
      docs.select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok"))).count()
    )
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    t("explode+leads")(
      docs
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .withColumn("t1", lead(col("tok"), 1).over(w))
        .withColumn("t2", lead(col("tok"), 2).over(w))
        .count()
    )
    val base = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .where(col("tok").isNotNull && col("t1").isNotNull && col("t2").isNotNull)
    t("=+where")(base.count())
    val hashed = base.select(col("doc_id"), xxhash64(concat_ws(" ", col("tok"), col("t1"), col("t2"))).as("sh"))
    t("=+hash")(hashed.count())
    t("=+distinct")(hashed.distinct().count())
    t("=+distinct warm")(hashed.distinct().count())
    t("=+distinct warm2")(hashed.distinct().count())
    t("shingleHashes")(MinHashLsh.shingleHashes(docs, "text", "doc_id", 3).count())
    val sig = MinHashLsh.signatures(docs, "text", "doc_id")
    t("signatures")(sig.count())
    t("bands")(MinHashLsh.bands(sig, "doc_id", 16, 64).count())
    t("candidatePairs")(MinHashLsh.candidatePairs(docs, "text", "doc_id").count())
    t("nearDuplicates")(MinHashLsh.nearDuplicates(docs, "text", "doc_id", 0.05).count())
    spark.stop()
  }
}
