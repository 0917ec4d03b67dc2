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

  test("salt actually spreads a hot key over multiple buckets") {
    import spark.implicits._
    val hot = Seq.fill(1000)(7L).toDF("k")
    val salted = hot.withColumn("__salt", floor(rand(42L) * 8).cast("int"))
    val n = salted.select("__salt").distinct().count()
    assert(n >= 6, s"expected the hot key spread over ~8 salts, got $n")
  }
}
