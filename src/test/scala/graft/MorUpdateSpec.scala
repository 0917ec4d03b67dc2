package graft

import org.apache.hadoop.fs.Path

import graft.catalog.Snapshots

/** Merge-on-read UPDATE via deletion vectors (r15): `UPDATE` on a
  * `deletion_vectors='true'` table commits one position vector (the
  * matched rows' old positions) plus one small generation (the updated
  * rows) — no candidate data file is rewritten — and every read path
  * (current, time travel, change feed) serves the correct view. Shapes
  * the command does not serve fall back to the stock copy-on-write path.
  */
class MorUpdateSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mor-$tag").toFile.getAbsolutePath

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Data files (absolute path -> length) under a table dir, excluding
    * dv/changes/manifest/meta sidecars.
    */
  private def dataFiles(dir: String): Map[String, Long] = {
    val fs = fsOf(dir)
    def walk(p: Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString -> st.getLen)
      }
    walk(new Path(dir)).toMap
  }

  test("unpartitioned dv table: point UPDATE touches no pre-existing data file; value, count, time travel, change feed all correct") {
    val dir = freshDir("file")
    spark.conf.set("spark.sql.catalog.graft_mu", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mu.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mu.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "5")
    try {
      spark.sql("CREATE TABLE graft_mu.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id % 7 AS grp, " +
        "md5(CAST(id AS STRING)) AS payload FROM range(10000)")
      val before = dataFiles(s"$dir/t")
      assert(before.size >= 4)

      spark.sql("UPDATE graft_mu.main.t SET payload = 'X', grp = grp + 100 " +
        "WHERE id = 4242")

      // merge-on-read: every pre-existing data file byte-identical; the
      // only new bytes are the one-row generation
      val after = dataFiles(s"$dir/t")
      assert(before.toSet.subsetOf(after.toSet),
        "mor UPDATE must not rewrite pre-existing data files")
      val added = after.keySet -- before.keySet
      assert(added.nonEmpty && added.forall(after(_) < 64 * 1024),
        s"the new generation should be tiny, got ${added.map(after)}")

      // manifest: kind morupdate, dv recorded
      val fs = fsOf(dir)
      val snap = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(snap.kind == "morupdate")
      assert(snap.dvs.nonEmpty && snap.dvRows.values.sum == 1L)

      // live reads serve the updated value exactly once
      assert(spark.table("graft_mu.main.t").count() == 10000)
      val row = spark.sql(
        "SELECT grp, payload FROM graft_mu.main.t WHERE id = 4242").collect()
      assert(row.length == 1)
      assert(row.head.getLong(0) == 4242 % 7 + 100 && row.head.getString(1) == "X")
      // neighbors in the same file untouched
      assert(spark.sql("SELECT count(*) FROM graft_mu.main.t " +
        "WHERE id IN (4241, 4243) AND payload = md5(CAST(id AS STRING))")
        .collect().head.getLong(0) == 2)

      // time travel serves the pre-update value
      assert(spark.sql("SELECT payload FROM graft_mu.main.t VERSION AS OF '1' " +
        "WHERE id = 4242").collect().head.getString(0) ==
        spark.sql("SELECT md5('4242')").collect().head.getString(0))

      // change feed: exact D (old row) + I (new row), synthesized
      val chg = Snapshots.changesBetween(spark, new Path(s"$dir/t"), 1L, 2L)
        .collect().map(r => (r.getAs[String]("_change_op"),
          r.getAs[Long]("id"), r.getAs[String]("payload"))).sortBy(_._1)
      assert(chg.length == 2, s"expected D+I, got ${chg.toSeq}")
      assert(chg(0) == ("D", 4242L, spark.sql("SELECT md5('4242')")
        .collect().head.getString(0)))
      assert(chg(1) == ("I", 4242L, "X"))

      // re-UPDATE of the same row (now living in the new generation)
      spark.sql("UPDATE graft_mu.main.t SET payload = 'Y' WHERE id = 4242")
      assert(spark.sql("SELECT payload FROM graft_mu.main.t WHERE id = 4242")
        .collect().head.getString(0) == "Y")
      assert(spark.table("graft_mu.main.t").count() == 10000)

      // no-match UPDATE commits nothing
      val v = Snapshots.current(fs, new Path(s"$dir/t")).get.version
      spark.sql("UPDATE graft_mu.main.t SET payload = 'Z' WHERE id = -1")
      assert(Snapshots.current(fs, new Path(s"$dir/t")).get.version == v)
    } finally {
      prevH match {
        case Some(x) => spark.conf.set(graft.catalog.History.Key, x)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      spark.sql("DROP TABLE IF EXISTS graft_mu.main.t")
    }
  }

  test("partitioned dv table: UPDATE that changes the partition value vectors the old position and lands the row in its new partition") {
    val dir = freshDir("part")
    spark.conf.set("spark.sql.catalog.graft_mp", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mp.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mp.main.t")
    try {
      spark.sql("CREATE TABLE graft_mp.main.t (id BIGINT, v STRING, k INT) " +
        "USING parquet PARTITIONED BY (k) " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true')")
      spark.sql("INSERT INTO graft_mp.main.t " +
        "SELECT id, CAST(id AS STRING), CAST(id % 4 AS INT) FROM range(4000)")
      val before = dataFiles(s"$dir/t")

      spark.sql("UPDATE graft_mp.main.t SET k = 9, v = 'moved' WHERE id = 1234")

      val after = dataFiles(s"$dir/t")
      assert(before.toSet.subsetOf(after.toSet),
        "partition-moving mor UPDATE must not rewrite pre-existing files")
      assert((after.keySet -- before.keySet).exists(_.contains("k=9")),
        "the updated row must land under its NEW partition")

      assert(spark.table("graft_mp.main.t").count() == 4000)
      val moved = spark.sql(
        "SELECT k, v FROM graft_mp.main.t WHERE id = 1234").collect()
      assert(moved.length == 1 && moved.head.getInt(0) == 9 &&
        moved.head.getString(1) == "moved")
      assert(spark.sql(
        "SELECT count(*) FROM graft_mp.main.t WHERE k = 2 AND id = 1234")
        .collect().head.getLong(0) == 0)
      // partition pruning on the new partition finds the row
      assert(spark.sql("SELECT count(*) FROM graft_mp.main.t WHERE k = 9")
        .collect().head.getLong(0) == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_mp.main.t")
  }

  test("shapes the command does not serve fall back: subquery UPDATE refuses via the resurrection firewall while vectors are live, works copy-on-write when clean") {
    val dir = freshDir("fb")
    spark.conf.set("spark.sql.catalog.graft_mf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mf.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mf.main.t")
    spark.sql("DROP TABLE IF EXISTS graft_mf.main.keys")
    try {
      spark.sql("CREATE TABLE graft_mf.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, CAST(id AS STRING) AS v FROM range(1000)")
      spark.sql("CREATE TABLE graft_mf.main.keys AS SELECT id FROM range(3)")

      // clean table: subquery UPDATE falls back to copy-on-write and works
      spark.sql("UPDATE graft_mf.main.t SET v = 'sub' WHERE id IN " +
        "(SELECT id FROM graft_mf.main.keys)")
      assert(spark.sql("SELECT count(*) FROM graft_mf.main.t WHERE v = 'sub'")
        .collect().head.getLong(0) == 3)

      // live vectors: the fallback path refuses loudly, naming compact
      spark.sql("DELETE FROM graft_mf.main.t WHERE id = 500")
      val e = intercept[Exception] {
        spark.sql("UPDATE graft_mf.main.t SET v = 'sub2' WHERE id IN " +
          "(SELECT id FROM graft_mf.main.keys)")
      }
      def msgs(t: Throwable): String = {
        var c: Throwable = t; val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append('|'); c = c.getCause }
        sb.toString
      }
      assert(msgs(e).contains("deletion vectors"), msgs(e))

      // while the SERVABLE shape still works on the vectored table
      spark.sql("UPDATE graft_mf.main.t SET v = 'mor' WHERE id = 7")
      assert(spark.sql("SELECT v FROM graft_mf.main.t WHERE id = 7")
        .collect().head.getString(0) == "mor")
      assert(spark.table("graft_mf.main.t").count() == 999)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_mf.main.t")
      spark.sql("DROP TABLE IF EXISTS graft_mf.main.keys")
    }
  }

  test("governance: mor UPDATE on a policy-restricted table refuses") {
    val dir = freshDir("gov")
    spark.conf.set("spark.sql.catalog.graft_mgov", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mgov.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_mgov.main.tgov")
    try {
      spark.sql("CREATE TABLE graft_mgov.main.tgov " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, CAST(id AS STRING) AS v FROM range(100)")
      graft.plans.GovernancePolicies.register("main.tgov",
        graft.plans.TablePolicy(rowFilterSql = Some("id < 50")))
      try {
        val e = intercept[Exception] {
          spark.sql("UPDATE graft_mgov.main.tgov SET v = 'x' WHERE id = 1")
        }
        assert(e.getMessage.contains("governed"), e.getMessage)
      } finally graft.plans.GovernancePolicies.clear()
    } finally spark.sql("DROP TABLE IF EXISTS graft_mgov.main.tgov")
  }
}
