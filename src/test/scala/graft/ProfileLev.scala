package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time q_ivfpq_topk (sf0.1) — the bounded-verify A/B driver.
  * sbt "Test/runMain graft.ProfileLev"
  */
object ProfileLev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_ivfpq_topk")(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] q_ivfpq_topk #$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.operators.Caches.release(spark)
    }
    spark.stop()
  }
}
