package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.util.Tables

class SourcesSpec extends SparkSpec {

  test("bucketed co-located join runs without any Exchange and matches plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Bucketed.writeBucketed(li, "li_b", "l_orderkey", 4)
    Bucketed.writeBucketed(orders, "ord_b", "l_orderkey", 4)

    // force a sort-merge join so the plan shape (not a broadcast) is
    // what's under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.cogroupedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val got = joined.collect()

      // identical rows to the plain (shuffled) join
      val want = li.join(orders, "l_orderkey").collect()
      assert(got.map(_.toString).sorted.toSeq == want.map(_.toString).sorted.toSeq)

      // the executed plan reads both bucketed scans directly: no
      // shuffle on either side (bucket layout satisfies the join's
      // required distribution)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed scan reports bucket pruning metadata (SelectedBucketsCount)") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    Bucketed.writeBucketed(li, "li_prune", "l_orderkey", 4)
    // the planner turns OFF bucketed scans when no operator needs the
    // distribution ("disabled by query planner") — which also forfeits
    // bucket PRUNING; pin it on for the pruning assertion
    val prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = Bucketed.table(spark, "li_prune").where(col("l_orderkey") === 1L)
      one.collect()
      val plan = one.queryExecution.executedPlan.toString
      // an equality filter on the bucket key scans 1 of 4 buckets
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"), plan)
    } finally spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
  }
}
