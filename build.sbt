ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "okeratrinospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap sized PER CORE, not as a flat constant: local[N] runs N concurrent
// tasks in this one JVM, so execution memory per task is heap*0.6/N — a flat
// 8g at N=32 is ~150 MB/task and the aggregation/join-heavy queries spill or
// GC-thrash exactly when the box is loaded (optimization guide §5: more
// memory per concurrent task; r15 driver bench measured several
// memory-heavy queries SLOWER at 32 cores than at 8 for this reason).
// 1.5g/core mirrors a small-but-sane executor sizing at any scale; capped
// at 64g (half this sandbox), floored at 8g (the old default), and still
// overridable via SPARK_DRIVER_MEM.
val graftDriverMem: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val cpus = sys.env.get("SPARK_GRAFT_CPUS")
    .flatMap(c => scala.util.Try(c.toInt).toOption).getOrElse(32)
  val gb = math.max(8, math.min(64, (cpus * 3) / 2))
  s"${gb}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftDriverMem",
)
