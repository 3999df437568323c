package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column-level dataset profiling — the first page of any dataset card
  * ([[SourceReport]] is the per-source rollup; this is the per-COLUMN
  * one): null census, exact distinct count, and min/max per column,
  * numeric and string ranges typed separately (casting a double
  * through a string is engine-dependent; emitting them in their own
  * columns keeps the profile exactly replayable).
  *
  * One aggregate pass computes every column's stats simultaneously;
  * the multi-column exact `count_distinct` expands the scan k-ways
  * (Spark's EXPAND — honest cost, documented), so for WIDE tables at
  * corpus scale swap exact for `approx_count_distinct` (the
  * [[graft.text.Vocab.strataProfile]] HLL path — same frame shape,
  * rsd contract instead of exactness). Output is one row per profiled
  * column: (column, n, n_null, n_distinct, min_num, max_num, min_str,
  * max_str).
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.table: need at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"Profile.table: no column $c"))
    val aggs = cols.flatMap { c =>
      val isNum = schema(c).dataType.isInstanceOf[NumericType]
      val isStr = schema(c).dataType == StringType
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as(s"__minn_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as(s"__maxn_$c"),
        (if (isStr) min(col(c)) else lit(null).cast("string")).as(s"__mins_$c"),
        (if (isStr) max(col(c)) else lit(null).cast("string")).as(s"__maxs_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single stats row to one output row per column
    val rows = cols.map { c =>
      struct(
        // col_name, not "column": reserved word in ANSI SQL replays
        lit(c).as("col_name"),
        col(s"__n_$c").as("n"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__minn_$c").as("min_num"),
        col(s"__maxn_$c").as("max_num"),
        col(s"__mins_$c").as("min_str"),
        col(s"__maxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
