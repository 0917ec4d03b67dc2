package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.catalog.Snapshots

/** Merge-on-read DELETE via deletion vectors (r15): a point DELETE on a
  * `deletion_vectors='true'` snapshot table writes one tiny (file, pos)
  * parquet plus one manifest — no data file is touched — and every read
  * path (current, time travel, incremental, change feed) serves the
  * correct live view.
  */
class DeletionVectorsSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dv-$tag").toFile.getAbsolutePath

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Direct-API compaction bypasses the catalog, so evict its TTL cache —
    * the same discipline the compaction corpus queries apply.
    */
  private def invalidate(cat: String, table: String): Unit =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .invalidateTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("main"), table))

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

  test("unpartitioned dv table: point DELETE touches no data file; reads, count, time travel all correct") {
    val dir = freshDir("file")
    spark.conf.set("spark.sql.catalog.graft_dvf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvf.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvf.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "3")
    try {
      spark.sql("CREATE TABLE graft_dvf.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT /*+ REPARTITION_BY_RANGE(4, id) */ id, id % 7 AS grp, " +
        "md5(CAST(id AS STRING)) AS payload FROM range(10000)")
      val before = dataFiles(s"$dir/t")
      assert(before.size >= 4)

      spark.sql("DELETE FROM graft_dvf.main.t WHERE id = 4242")

      // merge-on-read: every data file byte-identical, none added/removed
      assert(dataFiles(s"$dir/t") == before,
        "dv DELETE must not touch data files")
      // and the dv sidecar is tiny
      val fs = fsOf(dir)
      val dvRoot = new Path(s"$dir/t/${Snapshots.DvDir}")
      assert(fs.exists(dvRoot))
      val dvBytes = fs.listStatus(dvRoot).map(st =>
        fs.getContentSummary(st.getPath).getLength).sum
      assert(dvBytes < 64 * 1024, s"dv bytes $dvBytes should be tiny")

      // live reads drop the row
      assert(spark.table("graft_dvf.main.t").count() == 9999)
      assert(spark.sql(
        "SELECT count(*) FROM graft_dvf.main.t WHERE id = 4242")
        .collect().head.getLong(0) == 0)
      // untouched rows intact, including neighbors in the same file
      assert(spark.sql(
        "SELECT count(*) FROM graft_dvf.main.t WHERE id IN (4241, 4243)")
        .collect().head.getLong(0) == 2)
      // planner row stats come from the decremented manifest accounting
      val snap = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(snap.totalRows.contains(9999L))
      assert(snap.kind == "dvdelete")

      // time travel to the pre-delete manifest still serves the row
      assert(spark.sql(
        "SELECT count(*) FROM graft_dvf.main.t VERSION AS OF '1' WHERE id = 4242")
        .collect().head.getLong(0) == 1)

      // second DELETE on the SAME file unions positions (no double count)
      spark.sql("DELETE FROM graft_dvf.main.t WHERE id IN (4242, 4250)")
      assert(spark.table("graft_dvf.main.t").count() == 9998)
      val snap2 = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(snap2.totalRows.contains(9998L))

      // aggregate over the live view matches an exact restatement
      val got = spark.sql(
        "SELECT grp, count(*) AS n, sum(id) AS s FROM graft_dvf.main.t GROUP BY grp")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = spark.range(10000)
        .filter(!col("id").isin(4242L, 4250L))
        .groupBy((col("id") % 7).as("grp"))
        .agg(count("*").as("n"), sum("id").as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
    } finally {
      prevH match {
        case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      spark.sql("DROP TABLE IF EXISTS graft_dvf.main.t")
    }
  }

  test("partitioned dv table: data-predicate DELETE is a dv commit; partition-predicate DELETE stays metadata-only") {
    val dir = freshDir("part")
    spark.conf.set("spark.sql.catalog.graft_dvp", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvp.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvp.main.t")
    try {
      spark.sql("CREATE TABLE graft_dvp.main.t PARTITIONED BY (grp) " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, CAST(id % 4 AS INT) AS grp FROM range(8000)")
      val before = dataFiles(s"$dir/t")

      spark.sql("DELETE FROM graft_dvp.main.t WHERE id = 1234") // grp 2
      assert(dataFiles(s"$dir/t") == before)
      assert(spark.table("graft_dvp.main.t").count() == 7999)
      val fs = fsOf(dir)
      val s1 = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(s1.kind == "dvdelete" && s1.dvs.size == 1)
      // the vectored file lives under the matching partition only
      assert(s1.dvs.keysIterator.forall(_.startsWith("grp=2/")))

      // partition-only predicate: entry drop, not a vector
      spark.sql("DELETE FROM graft_dvp.main.t WHERE grp = 3")
      val s2 = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(s2.kind == "delete")
      assert(!s2.entries.contains("grp=3"))
      // grp=3's dv-free files dropped their (nonexistent) dvs; grp=2's
      // vector survives the disjoint edit
      assert(s2.dvs.size == 1)
      assert(spark.table("graft_dvp.main.t").count() == 7999 - 2000)
      // mixed predicate (partition + data conjunct) also rides the dv path
      spark.sql("DELETE FROM graft_dvp.main.t WHERE grp = 1 AND id < 100")
      assert(spark.table("graft_dvp.main.t").count() == 5999 - 25)
    } finally spark.sql("DROP TABLE IF EXISTS graft_dvp.main.t")
  }

  test("UPDATE is merge-on-read on dv tables; copy-on-write MERGE refuses while vectors are live; compaction materializes them and reopens COW") {
    val dir = freshDir("cow")
    spark.conf.set("spark.sql.catalog.graft_dvc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvc.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvc.main.t")
    try {
      spark.sql("CREATE TABLE graft_dvc.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT /*+ REPARTITION_BY_RANGE(3, id) */ id, CAST(0 AS LONG) AS v " +
        "FROM range(3000)")
      // UPDATE rides the merge-on-read path (r15d — see MorUpdateSpec)
      spark.sql("UPDATE graft_dvc.main.t SET v = 1 WHERE id = 7")
      assert(spark.sql("SELECT v FROM graft_dvc.main.t WHERE id = 7")
        .collect().head.getLong(0) == 1)

      spark.sql("DELETE FROM graft_dvc.main.t WHERE id = 2500")
      assert(spark.table("graft_dvc.main.t").count() == 2999)

      // UPDATE with live vectors works — merge-on-read never resurrects
      spark.sql("UPDATE graft_dvc.main.t SET v = 2 WHERE id = 8")
      assert(spark.sql("SELECT v FROM graft_dvc.main.t WHERE id = 8")
        .collect().head.getLong(0) == 2)
      assert(spark.table("graft_dvc.main.t").count() == 2999)

      // live vectors: copy-on-write MERGE would resurrect the deleted
      // row — refuse loudly
      val e = intercept[Exception] {
        spark.sql("MERGE INTO graft_dvc.main.t AS tgt " +
          "USING (SELECT 9L AS id, 99L AS v) AS src ON tgt.id = src.id " +
          "WHEN MATCHED THEN UPDATE SET v = src.v")
      }
      def rootMsg(t: Throwable): String = {
        var c: Throwable = t
        val sb = new StringBuilder
        while (c != null) { sb.append(c.getMessage).append(" | "); c = c.getCause }
        sb.toString
      }
      assert(rootMsg(e).contains("deletion vectors"), rootMsg(e))

      // compaction applies the vectors and clears them
      val fs = fsOf(dir)
      assert(Snapshots.compact(spark, new Path(s"$dir/t")) > 0)
      invalidate("graft_dvc", "t")
      val afterCompact = Snapshots.current(fs, new Path(s"$dir/t")).get
      assert(afterCompact.dvs.isEmpty && afterCompact.dvRows.isEmpty)
      assert(spark.table("graft_dvc.main.t").count() == 2999)
      assert(spark.sql("SELECT count(*) FROM graft_dvc.main.t WHERE id = 2500")
        .collect().head.getLong(0) == 0)
      // updates survived the materialization
      assert(spark.sql("SELECT v FROM graft_dvc.main.t WHERE id = 7")
        .collect().head.getLong(0) == 1)

      // COW MERGE works again
      spark.sql("MERGE INTO graft_dvc.main.t AS tgt " +
        "USING (SELECT 9L AS id, 99L AS v) AS src ON tgt.id = src.id " +
        "WHEN MATCHED THEN UPDATE SET v = src.v")
      assert(spark.sql("SELECT v FROM graft_dvc.main.t WHERE id = 9")
        .collect().head.getLong(0) == 99)
    } finally spark.sql("DROP TABLE IF EXISTS graft_dvc.main.t")
  }

  test("change feed synthesizes exact D rows from the pair-set difference; tail reads serve the live view") {
    val dir = freshDir("cdf")
    spark.conf.set("spark.sql.catalog.graft_dvd", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvd.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvd.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "4")
    try {
      spark.sql("CREATE TABLE graft_dvd.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, id * 10 AS v FROM range(1000)")
      spark.sql("DELETE FROM graft_dvd.main.t WHERE id IN (5, 6, 7)")
      spark.sql("DELETE FROM graft_dvd.main.t WHERE id = 6 OR id = 900")

      val root = new Path(s"$dir/t")
      // v1 -> v2: exactly ids 5,6,7 as D
      val feed12 = Snapshots.changesBetween(spark, root, 1L, 2L)
        .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_op")),
          r.getLong(r.fieldIndex("_change_version")))).toSet
      assert(feed12 == Set((5L, "D", 2L), (6L, "D", 2L), (7L, "D", 2L)))
      // v2 -> v3: id 6 was ALREADY deleted — only 900 is fresh
      val feed23 = Snapshots.changesBetween(spark, root, 2L, 3L)
        .collect().map(r => (r.getLong(0), r.getString(r.fieldIndex("_change_op")))).toSet
      assert(feed23 == Set((900L, "D")))

      // incremental consumption after an append serves live rows only
      spark.sql("INSERT INTO graft_dvd.main.t SELECT id + 100000, 0 FROM range(10)")
      val added = Snapshots.addedBetween(spark, root, 3L, 4L)
      assert(added.count() == 10)

      assert(spark.table("graft_dvd.main.t").count() == 1000 - 4 + 10)
    } finally {
      prevH match {
        case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      spark.sql("DROP TABLE IF EXISTS graft_dvd.main.t")
    }
  }

  test("governance composes: policy filter/mask applies over the dv-filtered live view") {
    import graft.plans.{ColumnMask, GovernancePolicies, TablePolicy}
    val dir = freshDir("gov")
    spark.conf.set("spark.sql.catalog.graft_dvg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvg.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvg.main.t_dvgov")
    try {
      spark.sql("CREATE TABLE graft_dvg.main.t_dvgov " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, CAST(id % 2 AS INT) AS parity, " +
        "concat('u', CAST(id AS STRING)) AS who FROM range(100)")
      spark.sql("DELETE FROM graft_dvg.main.t_dvgov WHERE id = 11")
      GovernancePolicies.register("main.t_dvgov", TablePolicy(
        rowFilterSql = Some("parity = 1"),
        masks = Seq(ColumnMask("who", "'masked'"))))
      try {
        val rows = spark.table("graft_dvg.main.t_dvgov").collect()
        // 50 odd ids minus the deleted id=11
        assert(rows.length == 49)
        assert(rows.forall(_.getString(2) == "masked"))
        assert(!rows.exists(_.getLong(0) == 11L))
      } finally GovernancePolicies.clear()
    } finally spark.sql("DROP TABLE IF EXISTS graft_dvg.main.t_dvgov")
  }

  test("concurrent disjoint commits rebase across a dv delete; same-entry conflicts refuse") {
    val dir = freshDir("occ")
    spark.conf.set("spark.sql.catalog.graft_dvo", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvo.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvo.main.t")
    try {
      spark.sql("CREATE TABLE graft_dvo.main.t PARTITIONED BY (grp) " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, CAST(id % 2 AS INT) AS grp FROM range(2000)")
      val root = new Path(s"$dir/t")
      val fs = fsOf(dir)

      // writer A loads the snapshot, writer B (the dv delete) commits,
      // then A's entry edit on the OTHER partition must rebase and land
      val aBase = Snapshots.current(fs, root).get
      spark.sql("DELETE FROM graft_dvo.main.t WHERE id = 100") // dv on grp=0
      val cur = Snapshots.current(fs, root).get
      assert(cur.kind == "dvdelete" && cur.version > aBase.version)
      // A drops grp=1 from its stale base: disjoint from the dv edit
      Snapshots.commit(fs, root, Some(aBase), aBase.entries - "grp=1",
        kind = "delete")
      val merged = Snapshots.current(fs, root).get
      assert(!merged.entries.contains("grp=1"))
      assert(merged.dvs.nonEmpty, "the dv edit must survive the rebase")
      assert(spark.table("graft_dvo.main.t").count() == 999)

      // a second writer whose stale base dv-deletes in the SAME partition a
      // concurrent rewrite replaced must refuse
      val bBase = Snapshots.current(fs, root).get
      // concurrent compaction rewrites grp=0 (its files carry the dv)
      assert(Snapshots.compact(spark, root) > 0)
      invalidate("graft_dvo", "t")
      intercept[graft.catalog.ConcurrentCommitException] {
        Snapshots.commit(fs, root, Some(bBase), bBase.entries,
          kind = "dvdelete",
          dvEdit = Some((bBase.dvs ++ bBase.dvs.keySet.map(_ -> "dv-fake"),
            bBase.dvRows.map { case (k, v) => k -> (v + 1) })))
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_dvo.main.t")
  }

  test("DELETE matching nothing commits nothing; retention sweeps dropped dv dirs") {
    val dir = freshDir("ret")
    spark.conf.set("spark.sql.catalog.graft_dvr", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_dvr.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_dvr.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    val prevG = spark.conf.getOption(Snapshots.OrphanGraceKey)
    try {
      spark.sql("CREATE TABLE graft_dvr.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id FROM range(100)")
      val fs = fsOf(dir)
      val root = new Path(s"$dir/t")
      val v1 = Snapshots.current(fs, root).get.version
      spark.sql("DELETE FROM graft_dvr.main.t WHERE id = 12345") // no match
      assert(Snapshots.current(fs, root).get.version == v1,
        "a no-match DELETE must not commit")

      // dv, then compact with zero retention: the dv dir must sweep
      spark.conf.set(graft.catalog.History.Key, "0")
      spark.conf.set(Snapshots.OrphanGraceKey, "0")
      spark.sql("DELETE FROM graft_dvr.main.t WHERE id = 5")
      assert(fs.exists(new Path(root, Snapshots.DvDir)) &&
        fs.listStatus(new Path(root, Snapshots.DvDir)).nonEmpty)
      assert(Snapshots.compact(spark, root) > 0)
      invalidate("graft_dvr", "t")
      val dvLeft =
        if (!fs.exists(new Path(root, Snapshots.DvDir))) 0
        else fs.listStatus(new Path(root, Snapshots.DvDir)).length
      assert(dvLeft == 0, "unreferenced dv dirs must sweep under retention")
      assert(spark.table("graft_dvr.main.t").count() == 99)
    } finally {
      prevH match {
        case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      prevG match {
        case Some(v) => spark.conf.set(Snapshots.OrphanGraceKey, v)
        case None => spark.conf.unset(Snapshots.OrphanGraceKey)
      }
      spark.sql("DROP TABLE IF EXISTS graft_dvr.main.t")
    }
  }
}
