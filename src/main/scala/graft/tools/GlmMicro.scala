package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Glm
import graft.util.Tables

/** Standalone wall-time decomposition of q79's three stages (no-FE
  * Poisson IRLS, robust sandwich, PPML with two absorbed FEs) so perf
  * work targets the stage that actually costs.
  * Usage: runMain graft.tools.GlmMicro [sfDir] [reps]
  */
object GlmMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.lineitem(spark, sfDir).withColumn("lp", log(col("l_extendedprice")))
    li.count() // warm the scan

    for (r <- 1 to reps) {
      var t0 = System.nanoTime
      val m = Glm.poisson(li, "l_quantity", Seq("lp", "l_discount"))
      val tPois = (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      Glm.seRobust(li, m, "l_quantity")
      val tRob = (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime
      val fe = Glm.poissonFE(
        li, "l_quantity", Seq("lp", "l_discount"), Seq("l_returnflag", "l_linestatus"))
      val tFe = (System.nanoTime - t0) / 1e9
      println(f"[glm-micro] rep $r: poisson=$tPois%.1fs (${m.iters} iters) " +
        f"robust=$tRob%.1fs ppmlFE=$tFe%.1fs (${fe.iters} iters)")
    }
    spark.stop()
  }
}
