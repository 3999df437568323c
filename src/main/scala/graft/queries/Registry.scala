package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise: a Spark query plus (where the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL.
  * Column names and rounding match on both sides so the driver's
  * hash-compare is stable (floats rounded to a per-magnitude precision;
  * every row set carries a natural unique key).
  */
case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)

object Registry {
  lazy val all: Seq[Q] = CoreQueries.all ++ PipelineQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
