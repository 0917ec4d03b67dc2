package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: sbt "Test/runMain graft.Profile" */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.sources.Tables(spark, d, "documents")
    println("docs: " + docs.count())
    val full = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.8)
    time("full minhash #1")(full.count())
    val full2 = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 3, 32, 8, 0.8)
    time("full minhash #2")(full2.count())

    val events = graft.sources.Tables(spark, d, "events")
    val orders = graft.sources.Tables(spark, d, "orders")
    println("events: " + events.count() + " orders: " + orders.count())
    val asof = graft.operators.AsOfJoin.backward(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
    time("asof #1")(asof.count())
    time("asof #2")(asof.count())

    val sess = graft.streaming.EventStreams.sessions(events, "30 minutes")
    time("session windows #1")(sess.count())
    time("session windows #2")(sess.count())

    // drive the stateful op through a genuine readStream → checkpointed sink
    val small = graft.sources.Tables(spark, "/root/testdata/sf0.001", "events")
    val src = java.nio.file.Files.createTempDirectory("prof-src").toString
    val ck = java.nio.file.Files.createTempDirectory("prof-ck").toString
    small.coalesce(1).write.mode("overwrite").parquet(src)
    val stream = graft.streaming.EventStreams.readEventStream(spark, src, small.schema)
    val q = graft.streaming.EventStreams.statefulUserTotals(stream)
      .writeStream.format("memory").queryName("prof_totals")
      .option("checkpointLocation", ck)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val totals = spark.sql("SELECT count(DISTINCT userId), sum(n) FROM prof_totals").collect().head
    println(s"stateful totals: users=${totals.getLong(0)} events=${totals.getLong(1)} " +
      s"(batch events=${small.count()})")
    spark.stop()
  }
}
