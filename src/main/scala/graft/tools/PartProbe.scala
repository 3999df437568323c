package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Scratch probe: does localCheckpoint preserve outputPartitioning under
  * AQE, does Bridge.iterCheckpointKeyed restore it, and do two keyed
  * checkpoints join exchange-free?
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def leafPart(df: org.apache.spark.sql.DataFrame): String = {
      val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      ds.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          s"partitioning=${lr.outputPartitioning} ordering=${lr.outputOrdering}"
      }.getOrElse("no LogicalRDD leaf")
    }

    val plain = spark.range(1000).select(($"id" % 100).cast("string").as("k"), $"id".as("x"))
      .repartition(col("k")).sortWithinPartitions("k").localCheckpoint(true)
    println("plain localCheckpoint: " + leafPart(plain))

    val a = Bridge.iterCheckpointKeyed(
      spark.range(1000).select(($"id" % 100).cast("string").as("k"), $"id".as("x"))
        .repartition(col("k")).sortWithinPartitions("k"))
    println("keyed ckpt (repartition): " + leafPart(a))

    val b = Bridge.iterCheckpointKeyed(
      spark.range(500).select(($"id" % 50).cast("string").as("k2"))
        .groupBy("k2").agg(count(lit(1)).cast("double").as("y")))
    println("keyed ckpt (groupBy):     " + leafPart(b))

    println("=== join a ⋈ b on k === (expect NO Exchange above the leaves)")
    a.join(b, col("k") === col("k2")).explain("formatted")

    println("=== groupBy on k after keyed ckpt (expect no Exchange) ===")
    a.groupBy("k").agg(sum("x")).explain("formatted")
    spark.stop()
  }
}
