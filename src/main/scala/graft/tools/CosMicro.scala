package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Cosine
import graft.util.Tables

/** Stage-by-stage timing of the all-pairs cosine baseline (q24) — added
  * after the round-2 bench showed 3.3s (r1) → 17.6s (r2) on an unchanged
  * plan. Each stage runs `reps` times so a hypervisor contention window
  * (this sandbox's documented 10–40× swings) is visible as inter-rep
  * variance rather than mistaken for plan cost.
  */
object CosMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime
        val r = f
        val dt = (System.nanoTime - t0) / 1e9
        (dt, r)
      }
      val ds = times.map(_._1)
      println(
        f"[micro] $name: min ${ds.min}%.2fs max ${ds.max}%.2fs " +
          s"all ${ds.map(d => f"$d%.2f").mkString("/")} -> ${times.head._2}")
    }

    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 500)
    t("scan+filter")(emb.count())
    val v = emb.select(col("vec_id"), col("embedding"), Cosine.norm(col("embedding")).as("nrm"))
    val l = v.select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("nrm").as("n_a"))
    val r = v.select(col("vec_id").as("id_b"), col("embedding").as("v_b"), col("nrm").as("n_b"))
    t("join only")(l.join(r, col("id_a") < col("id_b")).count())
    t("join+cosine")(
      l.join(r, col("id_a") < col("id_b"))
        .select(sum(Cosine.cosine(col("v_a"), col("v_b"), col("n_a"), col("n_b"))))
        .head().getDouble(0).round)
    t("full q24")(
      Cosine.nearDupPairs(emb, "vec_id", "embedding", threshold = 0.35).count())
    spark.stop()
  }
}
