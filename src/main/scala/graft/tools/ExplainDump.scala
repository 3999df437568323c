package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Plan-quality inspection: dumps `explain("formatted")` for selected
  * queries so scan pruning (`ReadSchema`), pushdown (`PushedFilters`),
  * broadcast joins and WholeStageCodegen spans can be reviewed.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> [qprefix...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefixes = if (args.length > 1) args.drop(1).toSeq else Seq("q01", "q02", "q06", "q20", "q25", "q31")
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // match the Bench/Verify session (see Bench.scala) so captured
      // plans reflect what the driver actually runs
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Registry.all if prefixes.exists(q.name.startsWith)) {
      println(s"\n========== ${q.name} ==========")
      try q.fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
