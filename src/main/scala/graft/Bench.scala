package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE coalescing targets ~64MB of BYTES per partition; the text /
      // embedding operators are CPU-bound on byte-small tables, and
      // coalescing serializes them onto one core. Keep AQE (broadcast
      // conversion, skew splitting), drop only the coalescing.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional filter for profiling: SPARK_GRAFT_ONLY=q11,q21
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // untimed warmup: session/codegen/JIT startup otherwise lands on the
    // alphabetically-first query
    try spark.read.parquet(s"$sfDir/lineitem.parquet").groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.err.println(s"[bench] start $name")
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] done  $name in $dt%.1fs")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
