package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** r15 optimization-round profiler: run ONE headline query (3 reps, like
  * Bench) and print, for the LAST rep, every stage's wall time, task count,
  * shuffle bytes and the head of its callsite/name — the stage-level
  * evidence the optimization guide (§1, §7) asks for before touching code.
  *
  * sbt "Test/runMain graft.ProfileStages <sfDir> <query> [reps]"
  */
object ProfileStages extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  case class St(name: String, submitted: Long, var completed: Long = 0L,
    var tasks: Int = 0, var taskTime: Long = 0L, var shufRead: Long = 0L,
    var shufWrite: Long = 0L, var input: Long = 0L)
  val stages = mutable.LinkedHashMap[Int, St]()
  // volatile: read from the listener-bus thread (ADVICE r15) — and flipped
  // false only after the post-run drain below, so tail events still land
  @volatile var collecting = false
  val listener = new SparkListener {
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      if (collecting) stages.synchronized {
        stages(e.stageInfo.stageId) =
          St(e.stageInfo.name, System.nanoTime())
      }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      if (collecting) stages.synchronized {
        stages.get(e.stageInfo.stageId).foreach { st =>
          st.completed = System.nanoTime()
          st.tasks = e.stageInfo.numTasks
        }
      }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (collecting) stages.synchronized {
        stages.get(e.stageId).foreach { st =>
          val m = e.taskMetrics
          if (m != null) {
            st.taskTime += m.executorRunTime
            st.shufRead += m.shuffleReadMetrics.totalBytesRead
            st.shufWrite += m.shuffleWriteMetrics.bytesWritten
            st.input += m.inputMetrics.bytesRead
          }
        }
      }
  }
  spark.sparkContext.addSparkListener(listener)

  val sfDir = args(0)
  val name = args(1)
  val reps = args.lift(2).map(_.toInt).getOrElse(3)
  (1 to reps).foreach { i =>
    if (i == reps) { stages.clear(); collecting = true }
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val dt = (System.nanoTime() - t0) / 1e9
    if (i < reps) collecting = false
    println(f"[profile] rep $i $name $dt%.2f s")
    if (i < reps) graft.operators.Caches.release(spark)
  }
  Thread.sleep(500) // drain listener bus BEFORE stopping collection
  collecting = false
  spark.sparkContext.removeSparkListener(listener)
  val sts = stages.synchronized(stages.values.toSeq)
  println(f"[profile] ${sts.size} stages, wall sum ${sts.map(s => (s.completed - s.submitted) / 1e9).sum}%.2f s (overlap possible)")
  sts.sortBy(s => -(s.completed - s.submitted)).take(40).foreach { s =>
    val wall = (s.completed - s.submitted) / 1e9
    println(f"[stage] $wall%6.3f s  tasks=${s.tasks}%3d taskTime=${s.taskTime}%6d ms in=${s.input / 1024}%8d KB sr=${s.shufRead / 1024}%7d KB sw=${s.shufWrite / 1024}%7d KB  ${s.name.linesIterator.next().take(110)}")
  }
  spark.stop()
}
