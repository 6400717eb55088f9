package graft

import org.apache.spark.sql.functions._

import graft.queries.Q

/** Bucketing: pre-partitioned co-located joins — the shuffle-elimination
  * pattern for repeated large-fact joins at 100 TB (SURVEY.md "minimize
  * shuffles"). Both sides bucketed by the join key => the sort-merge join
  * reads buckets pairwise with NO exchange in the plan.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed orders x lineitem join runs without a shuffle exchange") {
    val o = Q.t(spark, sf0001, "orders")
    val li = Q.t(spark, sf0001, "lineitem")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("g_orders_bucketed")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("g_lineitem_bucketed")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("g_lineitem_bucketed")
        .join(
          spark.table("g_orders_bucketed"),
          col("l_orderkey") === col("o_orderkey")
        )
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // same result as the plain join
      val expected = li
        .join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS g_orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_bucketed")
    }
  }
}
