package graft

import org.apache.spark.sql.SparkSession

object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("profile-cc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profcc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val docs = graft.sources.Tables(spark, d, "documents")
    val pairs = graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text")
    time("pairs count")(println("[profcc] pairs=" + pairs.count()))
    val pairsCached = pairs.cache()
    pairsCached.count()
    time("clusters over cached pairs")(
      println("[profcc] rows=" + graft.operators.Dedup.clusters(pairsCached).count()))
    time("clusters full (uncached)")(
      println("[profcc] rows=" + graft.operators.Dedup.clusters(
        graft.operators.Dedup.minHashLshPairs(docs, "doc_id", "text")).count()))
    spark.stop()
  }
}
