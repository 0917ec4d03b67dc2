package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan audit for the round-10 operators:
  * sbt "Test/runMain graft.PlanDumpR10"
  */
object PlanDumpR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val all = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_backoff_lm", "q_bm25_delete", "q_ivfpq_delete",
        "q_dedup_retract", "q_url_retract", "q_pipeline_e2e_incremental")
    names.foreach { name =>
      println(s"\n######## $name ########")
      println(all(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
