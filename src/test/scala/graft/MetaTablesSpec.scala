package graft

import org.apache.hadoop.fs.Path

import graft.catalog.Snapshots

/** SQL-visible metadata tables (r15): `SELECT * FROM cat.ns.t.history /
  * .files / .partitions` — manifest-served listings, no data file opened
  * for snapshot tables, honest nulls where the information would cost a
  * footer pass, governance refusal.
  */
class MetaTablesSpec extends SparkSpec {

  test("snapshot dv table: history/files/partitions serve manifest-carried accounting") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_mt", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mt.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mt.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "5")
    try {
      spark.sql("CREATE TABLE graft_mt.main.t (id BIGINT, v STRING, k INT) " +
        "USING parquet PARTITIONED BY (k) " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true')")
      spark.sql("INSERT INTO graft_mt.main.t " +
        "SELECT id, CAST(id AS STRING), CAST(id % 3 AS INT) FROM range(3000)")
      spark.sql("DELETE FROM graft_mt.main.t WHERE id = 100") // dv on k=1

      val hist = spark.sql("SELECT * FROM graft_mt.main.t.history").collect()
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      assert(hist.length == Snapshots.versions(fs, new Path(s"$dir/t")).length)
      assert(hist.head.getLong(0) > hist.last.getLong(0), "newest first")
      assert(hist.head.getString(2) == "dvdelete")
      assert(hist.head.getLong(4) == 2999L, "live_rows reflects the dv")

      val files = spark.sql("SELECT * FROM graft_mt.main.t.files").collect()
      assert(files.nonEmpty)
      // manifest-carried rows: every file has a count; total = live + dv'd
      assert(files.forall(!_.isNullAt(3)), "snapshot files carry row counts")
      assert(files.map(_.getLong(3)).sum == 3000L, "files.rows is PHYSICAL")
      assert(files.map(_.getLong(4)).sum == 1L, "one dv-deleted row")
      val vectored = files.filter(_.getBoolean(5))
      assert(vectored.length == 1 && vectored.head.getString(1) == "k=1")
      assert(files.forall(!_.isNullAt(2)), "bytes from the unit listing")

      val parts = spark.sql(
        "SELECT * FROM graft_mt.main.t.partitions ORDER BY partition").collect()
      assert(parts.map(_.getString(0)).toSeq == Seq("k=0", "k=1", "k=2"))
      // partitions.rows is LIVE (manifest accounting): the dv'd row is out
      assert(parts.map(_.getLong(3)).sum == 2999L)
      assert(parts.find(_.getString(0) == "k=1").get.getLong(3) == 999L)
      assert(parts.find(_.getString(0) == "k=1").get.getLong(4) == 1L)

      // the listing served the MANIFEST: a second INSERT bumps it
      spark.sql("INSERT INTO graft_mt.main.t SELECT 9999, 'x', 7")
      val parts2 = spark.sql("SELECT * FROM graft_mt.main.t.partitions").collect()
      assert(parts2.map(_.getString(0)).toSet == Set("k=0", "k=1", "k=2", "k=7"))
    } finally {
      prevH match {
        case Some(x) => spark.conf.set(graft.catalog.History.Key, x)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      spark.sql("DROP TABLE IF EXISTS graft_mt.main.t")
    }
  }

  test("plain table: files lists bytes with honest null rows; unknown meta name refuses; history refuses without snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta2").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_mt2", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mt2.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mt2.main.p")
    try {
      spark.sql("CREATE TABLE graft_mt2.main.p AS SELECT id FROM range(100)")
      val files = spark.sql("SELECT * FROM graft_mt2.main.p.files").collect()
      assert(files.nonEmpty)
      assert(files.forall(r => !r.isNullAt(2) && r.isNullAt(3)),
        "plain listing: bytes yes, rows null (no footer pass)")

      val e1 = intercept[Exception] {
        spark.sql("SELECT * FROM graft_mt2.main.p.history").collect()
      }
      assert(e1.getMessage.contains("snapshot"), e1.getMessage)

      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM graft_mt2.main.p.nope").collect()
      }
      assert(e2.getMessage.toLowerCase.contains("table or view not found") ||
        e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
        e2.getMessage.contains("NoSuchTable"), e2.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS graft_mt2.main.p")
  }

  test("governed table: metadata listing refuses for the restricted user") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta3").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_mt3", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mt3.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mt3.main.g")
    try {
      spark.sql("CREATE TABLE graft_mt3.main.g " +
        "TBLPROPERTIES ('snapshots'='true') AS SELECT id FROM range(10)")
      graft.plans.GovernancePolicies.register("main.g",
        graft.plans.TablePolicy(rowFilterSql = Some("id < 5")))
      try {
        val e = intercept[Exception] {
          spark.sql("SELECT * FROM graft_mt3.main.g.files").collect()
        }
        assert(e.getMessage.contains("governance"), e.getMessage)
      } finally graft.plans.GovernancePolicies.clear()
    } finally spark.sql("DROP TABLE IF EXISTS graft_mt3.main.g")
  }
}
