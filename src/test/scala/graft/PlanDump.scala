package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries:
  * sbt "Test/runMain graft.PlanDump" > plans.txt
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q1_agg", "q6_filter", "q5_join", "q_broadcast_join",
      "q_count_pushdown", "q_dedup_minhash", "q_sim_topk", "q_asof_join")
    val all = SparkEntry.queries
    interesting.foreach { name =>
      println(s"\n######## $name ########")
      println(all(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
