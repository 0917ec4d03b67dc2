package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.sources.Tables

/** registerAll must be fault-isolated per table: in round 7 a single events-schema
  * drift took down ~30 SQL-corpus queries that never touch events, because
  * registration was all-or-nothing. This spec injects an unreadable events fixture
  * and asserts the other nine tables stay fully queryable, then that a later call
  * against a healthy dir recovers (the memo must not record a partial
  * registration).
  */
class RegisterIsolationSpec extends SparkSpec {

  /** Build a fixture dir that mirrors sfDir but with a corrupt events.parquet. */
  private def corruptDir(): String = {
    val dir = Files.createTempDirectory("graft-broken-fixtures").toFile
    dir.deleteOnExit()
    for (n <- Tables.names if n != "events") {
      val src = Paths.get(s"$sfDir/$n.parquet")
      val dst = Paths.get(dir.getPath, s"$n.parquet")
      if (Files.isDirectory(src)) {
        Files.createDirectory(dst)
        Files.list(src).forEach { f =>
          Files.copy(f, dst.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING)
        }
      } else Files.copy(src, dst)
    }
    // not a parquet file: footer read throws during registration
    Files.write(Paths.get(dir.getPath, "events.parquet"), "not parquet".getBytes)
    dir.getPath
  }

  test("one unreadable table degrades to that table only; the other nine register") {
    val broken = corruptDir()
    Tables.registerAll(spark, broken)
    // every healthy table is queryable
    for (n <- Tables.names if n != "events") {
      assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) > 0, n)
    }
    // and an orders-only corpus query (the kind that died collaterally in r7) runs
    val w = spark.sql(
      """SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey ORDER BY n DESC, o_custkey LIMIT 5""")
    assert(w.count() == 5)
  }

  test("a later registerAll against a healthy dir recovers all ten tables") {
    // previous test left the memo unset (partial registration) — this call must
    // re-register everything from the healthy dir
    Tables.registerAll(spark, sfDir)
    for (n <- Tables.names) {
      assert(spark.sql(s"SELECT count(*) AS c FROM $n").head().getLong(0) > 0, n)
    }
  }
}
