package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler mirroring Bench's exact session config (extensions +
  * audit listener + noop sink) for the slow headline queries.
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("profile-cc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.observability.AuditListener.install(spark)
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profcc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val all = SparkEntry.queries
    def run(name: String, n: Int): Unit =
      (1 to n).foreach { i =>
        time(s"$name #$i")(
          all(name)(spark, d).write.format("noop").mode("overwrite").save())
      }
    run("q_window_timerange", 3)
    run("q_dedup_minhash", 3)
    run("q_dedup_clusters", 3)
    spark.stop()
  }
}
