package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: alternating A/B of the two EXACT k=2 blocking schemes on the
  * bench's heaviest query (q_fuzzy_join2's input) — FastSS deletion
  * neighborhoods (~len²/2 variant rows per string) vs PassJoin segments
  * (k+1 segment rows + O(k²·len-window) probe rows per string).
  * sbt "Test/runMain graft.ProfileFuzzy"
  */
object ProfileFuzzy {
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
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cust = spark.read.parquet(s"$d/customer.parquet")

    // sanity first: identical pair sets (both schemes are exact)
    val a = graft.operators.FuzzyJoin.pairsWithinScheme(
      cust, "c_custkey", "c_name", k = 2, forceSegments = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = graft.operators.FuzzyJoin.pairsWithinScheme(
      cust, "c_custkey", "c_name", k = 2, forceSegments = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    println(s"[prof] pair sets equal: ${a == b} (${a.size} pairs)")
    graft.operators.Caches.release(spark)

    for (i <- 1 to 3) {
      time(s"fastss deletion-neighborhood #$i")(noop(
        graft.operators.FuzzyJoin.pairsWithinScheme(
          cust, "c_custkey", "c_name", k = 2, forceSegments = false)))
      graft.operators.Caches.release(spark)
      time(s"passjoin segments           #$i")(noop(
        graft.operators.FuzzyJoin.pairsWithinScheme(
          cust, "c_custkey", "c_name", k = 2, forceSegments = true)))
      graft.operators.Caches.release(spark)
    }
    spark.stop()
  }
}
