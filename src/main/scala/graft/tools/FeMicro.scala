package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ml.FixedEffects
import graft.util.Tables

/** Standalone wall-time of the distributed-cell FE path (q59's shape):
  * two-way supp×part absorption over lineitem with collectCellLimit=0.
  * Usage: runMain graft.tools.FeMicro [sfDir] [reps]
  */
object FeMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    sys.env.get("GRAFT_FE_NOAQE").foreach(_ => spark.conf.set("spark.sql.adaptive.enabled", "false"))
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm the scan

    for (r <- 1 to reps) {
      val t0 = System.nanoTime
      val m = FixedEffects.fit(
        li, "l_extendedprice", Seq("l_quantity"), Seq("l_suppkey", "l_partkey"),
        collectCellLimit = 0L)
      val secs = (System.nanoTime - t0) / 1e9
      println(f"[fe-micro] rep $r: $secs%.1fs sweeps=${m.sweeps} slope=${m.coef(0)}%.6f n=${m.n}")
    }
    spark.stop()
  }
}
