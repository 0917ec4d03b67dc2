package graft
import org.apache.spark.sql.SparkSession

/** Time one headline query at sf0.1 with Bench's session wiring, 3 reps:
  * sbt "Test/runMain graft.TimeOne q_zorder" — for A/B-ing a single operator
  * without paying for the whole 48-query bench.
  */
object TimeOne extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
  val name = args(0)
  (1 to 3).foreach { _ =>
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[time] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  spark.stop()
}
