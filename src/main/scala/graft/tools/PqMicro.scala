package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{FloatVec, PqOps}
import graft.sim.AnnPq
import graft.util.Tables

/** Stage-by-stage timing of the PQ pipeline (perf diagnosis).
  * Usage: runMain graft.tools.PqMicro [sfDir]
  */
object PqMicro {
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

    val emb = Tables.embeddings(spark, sfDir)
    t("emb.count")(emb.count())
    val cb = t("train")(AnnPq.train(emb, "vec_id", "embedding", m = 16, k = 16, sampleN = 512))
    val cbLit = typedLit(cb.flat.toSeq)
    val codes = emb.select(col("vec_id").as("nid"), PqOps.encode(col("embedding"), cbLit, cb.dsub).as("code"))
    t("encode")(codes.count())
    t("encode warm")(codes.count())
    val qs = emb.where(col("vec_id") < 5).select(
      col("vec_id").as("qid"),
      col("embedding").as("qv"),
      PqOps.lut(col("embedding"), cbLit, cb.dsub).as("lut"),
      FloatVec.norm(col("embedding")).as("qnorm"))
    t("qs")(qs.count())
    val norm2 = typedLit(cb.norm2Table.toSeq)
    val scored = codes
      .crossJoin(broadcast(qs))
      .where(col("qid") =!= col("nid"))
      .withColumn(
        "adc_cos",
        PqOps.adc(col("code"), col("lut")) / (col("qnorm") * sqrt(PqOps.adc(col("code"), norm2))))
    t("scored")(scored.count())
    val w = Window.partitionBy(col("qid")).orderBy(col("adc_cos").desc, col("nid"))
    val short = scored.withColumn("rk", row_number().over(w)).where(col("rk") <= 50)
    t("shortlist")(short.count())
    t("topK rerank=0")(
      AnnPq.topK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 5, m = 16, kCent = 16, sampleN = 512).count())
    t("topK rerank=50")(
      AnnPq.topK(emb.where(col("vec_id") < 5), emb, "vec_id", "embedding",
        k = 5, m = 16, kCent = 16, rerank = 50, sampleN = 512).count())
    spark.stop()
  }
}
