package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: print spread gate inputs + plan for a sub-operator. */
object ScratchExplain extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val d = "/root/testdata/sf0.1"
  val docs = graft.sources.Tables(spark, d, "documents")
  println("defaultParallelism=" + spark.sparkContext.defaultParallelism)
  println("docs stats=" + docs.queryExecution.optimizedPlan.stats.sizeInBytes)
  val f = docs.filter(col("doc_id") < 250)
  println("filtered stats=" + f.queryExecution.optimizedPlan.stats.sizeInBytes)
  val st = graft.operators.Dedup.minHashState(f, "doc_id", "text")
  st.explain("formatted")
  spark.stop()
}
