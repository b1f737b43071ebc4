package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed co-located join: identical bucket layouts on the join key must
  * produce a shuffle-free (zero-Exchange) sort-merge plan. */
class BucketingSpec extends SparkSpec {

  test("identically-bucketed fact tables join with no Exchange in the plan") {
    val d = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.orders(spark, d), "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(Tables.lineitem(spark, d), "b_lineitem", "l_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(800)}")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle either side:\n${plan.take(1500)}")
      // and it computes the right thing
      val n = joined.count()
      assert(n === Tables.lineitem(spark, d).count()) // FK: every lineitem matches
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
