package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing (SURVEY.md §2.4 scale note): pre-partitioning both join sides on
  * the join key eliminates the shuffle entirely — the co-located-join layout a
  * 100 TB deployment uses for its hottest join keys. Verified by plan shape:
  * the bucketed sort-merge join contains NO Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-dim join plans without any shuffle") {
    val orders = Tables(spark, sfDir, "orders")
    val customer = Tables(spark, sfDir, "customer")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count("*").as("n"))
      val joinPlan = j.queryExecution.executedPlan.toString
      // the join itself must consume bucketed output directly: no Exchange
      // below the SortMergeJoin (the final groupBy may still shuffle)
      val smjSection = joinPlan.split("SortMergeJoin").last
      assert(joinPlan.contains("SortMergeJoin"), s"expected SMJ:\n$joinPlan")
      assert(!smjSection.contains("Exchange"),
        s"bucketed join still shuffles:\n$joinPlan")

      // identical results to the plain join
      val got = j.collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1))).toMap
      val want = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count("*").as("n"))
        .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1))).toMap
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
