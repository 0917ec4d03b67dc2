package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: dedupLines aggregate-count vs window path on a planted
  * extreme-duplication corpus (one hot line shared by every doc).
  * sbt "Test/runMain graft.ProfileDedupLines"
  */
object ProfileDedupLines {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 100k docs, every one carrying the same boilerplate line: the window
    // path piles all 100k copies into ONE sort partition; the aggregate path
    // ships one (line, 100000) row
    val n = sys.env.getOrElse("PROF_N", "100000").toInt
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("standard boilerplate footer line\npayload line number "),
        col("id").cast("string")).as("text"))
      .repartition(32).cache()
    docs.count()

    for (i <- 1 to 2) {
      time(s"aggregate-count path #$i")(noop(graft.operators.Pipelines.dedupLines(
        docs, "doc_id", "text", minCount = 2, aggregateCounts = true)))
      time(s"window path          #$i")(noop(graft.operators.Pipelines.dedupLines(
        docs, "doc_id", "text", minCount = 2, aggregateCounts = false)))
    }
    spark.stop()
  }
}
