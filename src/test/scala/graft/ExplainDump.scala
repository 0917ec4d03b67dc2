package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named headline queries to files — the
  * r15 optimization round's plan evidence (plans/r15/<q>_{before,after}.txt).
  *
  * sbt "Test/runMain graft.ExplainDump <sfDir> <outDir> <suffix> q_a,q_b"
  */
object ExplainDump extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val Array(sfDir, outDir, suffix) = args.take(3)
  Files.createDirectories(Paths.get(outDir))
  args(3).split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"[explain] wrote $name")
      graft.operators.Caches.release(spark)
    } catch { case e: Throwable =>
      System.err.println(s"[explain] $name failed: ${e.getMessage}")
    }
  }
  spark.stop()
}
