package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the operational answer to the 100 TB
  * "millions of tiny parquet files" problem that streaming ingest
  * ([[StreamingIngest]]) and fine-grained partitioned writes create:
  * every file costs a namenode entry, a scan task, a footer read and an
  * open/close round trip, so a corpus fragmented into 100 KB files
  * reads an order of magnitude slower than the same bytes in ~512 MB
  * files.
  *
  * Sizing comes from the FILE LISTING, not a data pass: output count =
  * ceil(total bytes / targetBytes). Ungrouped, rows are round-robin
  * repartitioned (balanced outputs regardless of input skew); with
  * `sortBy`, rows are RANGE-partitioned on the sort key and sorted
  * within each output so parquet min/max footers stay selective for
  * predicates on that key (the [[ZOrder]] property, preserved through
  * compaction rather than destroyed by it).
  */
object Compact {

  case class Report(filesBefore: Long, filesAfter: Long, bytes: Long, outputs: Int)

  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 512L << 20,
      sortBy: Seq[String] = Nil
  ): Report = {
    val conf = spark.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    val files = fs.listStatus(in).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    require(files.nonEmpty, s"no parquet files under $inDir")
    val totalBytes = files.map(_.getLen).sum
    val outputs = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortBy.isEmpty) df.repartition(outputs)
      else
        df.repartitionByRange(outputs, sortBy.map(col): _*)
          .sortWithinPartitions(sortBy.map(col): _*)
    shaped.write.mode(SaveMode.Overwrite).parquet(outDir)

    val outFs = new Path(outDir).getFileSystem(conf)
    val after = outFs.listStatus(new Path(outDir)).count { st =>
      st.isFile && st.getPath.getName.endsWith(".parquet")
    }
    Report(files.length.toLong, after.toLong, totalBytes, outputs)
  }
}
