package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpec {

  test("salted join returns exactly the rows of the plain join") {
    val orders = Tables(spark, sfDir, "orders")
    val customer = Tables(spark, sfDir, "customer")

    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey").agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("s"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2))).toSet

    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", buckets = 8)
      .groupBy("c_nationkey").agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("s"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2))).toSet

    assert(salted == plain)
  }

  test("AQE splits a skewed join partition at runtime") {
    import spark.implicits._
    // one pathological key holding ~90% of rows
    val left = spark.range(0, 200000)
      .select(when(col("id") % 10 < 9, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("rv"))

    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = left.join(right, "k")
      val n = j.collect().length.toLong // materialize THIS dataframe so AQE finalizes its plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
      // 180000 rows on the hot key + the 100 cold keys (id%10==9, id<1000)
      assert(n == 180100L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt actually spreads a hot key over multiple buckets") {
    import spark.implicits._
    val hot = Seq.fill(1000)(7L).toDF("k")
    val salted = hot.withColumn("__salt", floor(rand(42L) * 8).cast("int"))
    val n = salted.select("__salt").distinct().count()
    assert(n >= 6, s"expected the hot key spread over ~8 salts, got $n")
  }
}
