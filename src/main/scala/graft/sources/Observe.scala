package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Observation, SaveMode}

/** Zero-extra-pass pipeline telemetry via Spark's Observation API: the
  * named aggregates are evaluated BY the job that materializes the
  * frame (a `CollectMetrics` node riding the plan), so row counts,
  * null rates and quality tallies for every ingest write come for free
  * — no second scan, no separate metrics query racing the data. The
  * pattern a 100 TB ingest needs: the write IS the metrics pass.
  */
object Observe {

  /** Write `df` as parquet while collecting `metrics` from the SAME
    * job; returns the observed values keyed by metric name.
    */
  def writeWithMetrics(
      df: DataFrame,
      path: String,
      metrics: Map[String, Column]
  ): Map[String, Any] = {
    val obs = Observation()
    val named = metrics.toSeq
    val observed = df.observe(obs, named.head._2.as(named.head._1),
      named.tail.map { case (n, c) => c.as(n) }: _*)
    observed.write.mode(SaveMode.Overwrite).parquet(path)
    obs.get
  }
}
