package graft

import org.apache.hadoop.fs.Path

/** SQL TVFs over the snapshot layer + the vacuum procedure (r15):
  * `graft_table_changes` / `graft_table_added` as plain FROM-clause
  * functions (version numbers or tag names), and `CALL system.vacuum`
  * age-gated debris sweeping.
  */
class TableFunctionsSpec extends SparkSpec {

  test("graft_table_changes / graft_table_added serve the feeds from SQL; tags resolve; governance refuses") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_tvf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tvf.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_tvf.main.t")
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "6")
    try {
      spark.sql("CREATE TABLE graft_tvf.main.t " +
        "TBLPROPERTIES ('snapshots'='true', 'deletion_vectors'='true') AS " +
        "SELECT id, id * 10 AS v FROM range(1000)")
      spark.sql("DELETE FROM graft_tvf.main.t WHERE id IN (5, 6, 7)") // v2 dv
      spark.sql("INSERT INTO graft_tvf.main.t SELECT id + 5000, 1 FROM range(4)") // v3

      val chg = spark.sql(
        "SELECT _change_op, count(*) AS n FROM " +
          "graft_table_changes('graft_tvf.main.t', 1, 3) GROUP BY _change_op")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(chg == Map("D" -> 3L, "I" -> 4L), chg.toString)

      val added = spark.sql(
        "SELECT count(*) AS n, sum(id) AS s FROM " +
          "graft_table_added('graft_tvf.main.t', 2, 3)").collect().head
      assert(added.getLong(0) == 4L && added.getLong(1) == (5000L * 4 + 6))

      // tag names resolve as version arguments
      spark.sql("CALL graft_tvf.system.create_tag('main.t', 'start', 1)")
      assert(spark.sql(
        "SELECT count(*) FROM graft_table_changes('graft_tvf.main.t', 'start', 2)")
        .collect().head.getLong(0) == 3L)

      // joinable like any relation
      val joined = spark.sql(
        "SELECT count(*) FROM graft_table_added('graft_tvf.main.t', 2, 3) a " +
          "JOIN graft_tvf.main.t b ON a.id = b.id").collect().head.getLong(0)
      assert(joined == 4L)

      // governance refusal
      graft.plans.GovernancePolicies.register("main.t",
        graft.plans.TablePolicy(rowFilterSql = Some("id < 10")))
      try {
        val e = intercept[Exception] {
          spark.sql("SELECT * FROM graft_table_changes('graft_tvf.main.t', 1, 2)")
            .collect()
        }
        assert(e.getMessage.contains("governed"), e.getMessage)
      } finally graft.plans.GovernancePolicies.clear()
    } finally {
      prevH match {
        case Some(x) => spark.conf.set(graft.catalog.History.Key, x)
        case None => spark.conf.unset(graft.catalog.History.Key)
      }
      spark.sql("DROP TABLE IF EXISTS graft_tvf.main.t")
    }
  }

  test("CALL system.vacuum sweeps only debris older than the age gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vac")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_vac", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_vac.dir", dir)
    spark.sql("DROP TABLE IF EXISTS graft_vac.main.t")
    try {
      spark.sql("CREATE TABLE graft_vac.main.t " +
        "TBLPROPERTIES ('snapshots'='true') AS SELECT id FROM range(100)")
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      val ns = new Path(dir, "main") // 'main' namespace = catalog dir root?
      val root = if (fs.exists(new Path(dir, "t"))) new Path(dir) else ns
      // plant debris: one OLD (crashed writer), one FRESH (in-flight)
      val old1 = new Path(root, ".staging-t-deadbeef")
      val old2 = new Path(root, ".morupd-t-cafe0123")
      val fresh = new Path(root, ".rlpart-t-12345678")
      Seq(old1, old2, fresh).foreach(fs.mkdirs(_))
      val past = System.currentTimeMillis() - 7200000L
      fs.setTimes(old1, past, past)
      fs.setTimes(old2, past, past)

      val removed = spark.sql(
        "CALL graft_vac.system.vacuum('main.t')").collect().head.getInt(0)
      assert(removed == 2, s"expected the 2 old debris dirs, got $removed")
      assert(!fs.exists(old1) && !fs.exists(old2))
      assert(fs.exists(fresh), "in-flight staging younger than the gate survives")

      // age gate 0 takes the fresh one too
      val removed2 = spark.sql(
        "CALL graft_vac.system.vacuum('main.t', 0)").collect().head.getInt(0)
      assert(removed2 == 1 && !fs.exists(fresh))

      assert(spark.table("graft_vac.main.t").count() == 100, "table unharmed")
    } finally spark.sql("DROP TABLE IF EXISTS graft_vac.main.t")
  }
}
