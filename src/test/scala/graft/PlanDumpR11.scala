package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan audit for the round-11 operators:
  * sbt "Test/runMain graft.PlanDumpR11"
  */
object PlanDumpR11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val all = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dataset_merge", "q_catalog_ctas", "q_unigram_tok")
    names.foreach { name =>
      println(s"\n######## $name ########")
      println(all(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
