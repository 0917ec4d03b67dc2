package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: sbt "Test/runMain graft.Profile" */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // raw window query without the corpus helper (no registerAll, no listener)
    val orders = spark.read.parquet(s"$d/orders.parquet")
    orders.createOrReplaceTempView("orders")
    val q =
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS c30
        |FROM orders""".stripMargin
    time("timerange raw #1")(noop(spark.sql(q)))
    time("timerange raw #2")(noop(spark.sql(q)))
    // ROWS frame for comparison (same shuffle+sort, trivial frame logic)
    val q2 =
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |    ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) AS c30
        |FROM orders""".stripMargin
    time("rowsframe raw #1")(noop(spark.sql(q2)))
    time("rowsframe raw #2")(noop(spark.sql(q2)))
    // corpus-helper version (registerAll + SessionProps wrapper)
    val all = SparkEntry.queries
    time("timerange corpus #1")(noop(all("q_window_timerange")(spark, d)))
    time("timerange corpus #2")(noop(all("q_window_timerange")(spark, d)))
    spark.sql(q).explain("formatted")
    spark.stop()
  }
}
