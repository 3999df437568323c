package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Deterministic work metrics per query — jobs, stages, tasks, shuffle
  * bytes — via a SparkListener. Wall-clock on this sandbox swings
  * 10-40x under hypervisor contention (SURVEY §8g); these counts do
  * not. Used to adjudicate optimization A/Bs that the bench window
  * cannot.
  *
  * Usage: runMain graft.tools.WorkProbe <sfDir> <qprefix> [qprefix...]
  */
object WorkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val prefixes = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    // warmup (session/codegen), mirrors Bench
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => () }

    for (q <- Registry.all if prefixes.exists(p => q.name.startsWith(p))) {
      // settle listener events from the previous query
      Thread.sleep(800)
      jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      val n = try q.fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"${q.name} FAILED: $e"); -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(800)
      println(f"WORK ${q.name} rows=$n jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} shufReadMB=${shufRead.get / 1e6}%.1f " +
        f"shufWriteMB=${shufWrite.get / 1e6}%.1f wall=$dt%.1f")
      val keep = graft.queries.CoreQueries.protectedRddIds
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!keep(id)) rdd.unpersist(false) }
    }
    spark.stop()
  }
}
