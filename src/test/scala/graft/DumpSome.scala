package graft

/** Scratch: dump a SUBSET of SparkEntry.queries (+ their oracle SQL) into a
  * mini verify-out dir so tools/compare.py can gate just the queries under
  * active development without a full Verify pass.
  * sbt "Test/runMain graft.DumpSome <outDir> <sfDir> q1 q2 ..."
  */
object DumpSome {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sfDir = args(1)
    val names = args.drop(2).toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // dir name matches graft.Verify (no suffix): both compare tools accept it
      df.write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[dump] $n: done")
    }
    val oracles = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = oracles.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n") + "\""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
