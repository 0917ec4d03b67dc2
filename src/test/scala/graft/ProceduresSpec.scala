package graft

import org.apache.hadoop.fs.Path

import graft.catalog.Snapshots

/** `CALL <catalog>.system.<proc>(...)` (r15): the SQL maintenance surface
  * over the snapshot layer — compaction, retention, and rollback without
  * touching the Scala API.
  */
class ProceduresSpec extends SparkSpec {

  test("compact / expire_snapshots / rollback drive the snapshot table end-to-end through SQL CALL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-proc")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_proc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_proc.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_proc.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    val prevG = spark.conf.getOption(Snapshots.OrphanGraceKey)
    spark.conf.set(graft.catalog.History.Key, "10")
    try {
      spark.sql("CREATE TABLE graft_proc.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT /*+ REPARTITION_BY_RANGE(3, id) */ id, id * 2 AS v " +
        "FROM range(3000)")
      spark.sql("INSERT INTO graft_proc.main.t " +
        "SELECT /*+ REPARTITION(1) */ id + 10000, 0 FROM range(100)") // v2
      spark.sql("DELETE FROM graft_proc.main.t WHERE id = 42")          // v3 (dv)
      assert(spark.table("graft_proc.main.t").count() == 3099)

      val root = new Path(s"$dir/t")
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

      // rollback to the pre-delete version restores the row as a NEW commit
      val rolled = spark.sql(
        "CALL graft_proc.system.rollback('main.t', 2)").collect().head
      assert(rolled.getLong(0) == 2L && rolled.getLong(1) == 4L)
      assert(spark.table("graft_proc.main.t").count() == 3100)
      assert(spark.sql("SELECT count(*) FROM graft_proc.main.t WHERE id = 42")
        .collect().head.getLong(0) == 1)
      // the rolled-over state is STILL retained history
      assert(spark.sql(
        "SELECT count(*) FROM graft_proc.main.t VERSION AS OF '3' WHERE id = 42")
        .collect().head.getLong(0) == 0)

      // compact through CALL: fresh dv first so there is work to do
      spark.sql("DELETE FROM graft_proc.main.t WHERE id = 43") // v5 (dv)
      val compacted = spark.sql(
        "CALL graft_proc.system.compact('main.t')").collect().head.getInt(0)
      assert(compacted > 0)
      assert(Snapshots.current(fs, root).get.dvs.isEmpty)
      assert(spark.table("graft_proc.main.t").count() == 3099)

      // expire history down to 1 superseded manifest
      spark.conf.set(Snapshots.OrphanGraceKey, "0")
      val expired = spark.sql(
        "CALL graft_proc.system.expire_snapshots('main.t', 1)")
        .collect().head.getInt(0)
      assert(expired > 0)
      val vs = Snapshots.versions(fs, root)
      assert(vs.length == 2, s"expected current + 1 retained, got $vs")
      // live reads unharmed
      assert(spark.table("graft_proc.main.t").count() == 3099)

      // history lists retained versions newest-first with live-row counts
      val hist = spark.sql("CALL graft_proc.system.history('main.t')").collect()
      assert(hist.length == Snapshots.versions(fs, root).length)
      assert(hist.head.getLong(0) > hist.last.getLong(0), "newest first")
      assert(hist.head.getString(2) == "compact")
      assert(hist.head.getLong(4) == 3099L)

      // unknown procedure refuses with the roster
      val e = intercept[Exception] {
        spark.sql("CALL graft_proc.system.nope('main.t')").collect()
      }
      def msgs(t: Throwable): String = {
        var c: Throwable = t; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append('|'); c = c.getCause }
        sb.toString
      }
      assert(msgs(e).contains("no such procedure"), msgs(e))
    } finally {
      prevH match {
        case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      prevG match {
        case Some(v) => spark.conf.set(Snapshots.OrphanGraceKey, v)
        case None => spark.conf.unset(Snapshots.OrphanGraceKey)
      }
      spark.sql("DROP TABLE IF EXISTS graft_proc.main.t")
    }
  }
}
