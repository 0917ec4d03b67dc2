package graft

/** Views (SURVEY.md §2.11 M3/M6/M7/M8): create / list / query-through / replace /
  * drop, resolved by the session catalog the way the reference stores view SQL in
  * its planner (trino/RecordServiceMetadata.java:288-444).
  */
class ViewsSpec extends SparkSpec {

  test("create, query, replace, list and drop a view") {
    spark.sql("DROP VIEW IF EXISTS big_nations")
    spark.sql(
      """CREATE VIEW big_nations AS
        |SELECT n_regionkey, count(*) AS n FROM graft.main.nation
        |GROUP BY n_regionkey HAVING count(*) >= 5""".stripMargin)

    // M6: query through the view
    val rows = spark.sql("SELECT * FROM big_nations ORDER BY n_regionkey").collect()
    assert(rows.map(_.getLong(1)).sum == 25)

    // M3: listed as a view
    val views = spark.sql("SHOW VIEWS").collect().map(_.getString(1))
    assert(views.contains("big_nations"))

    // M7: CREATE OR REPLACE swaps the definition
    spark.sql(
      """CREATE OR REPLACE VIEW big_nations AS
        |SELECT n_regionkey, count(*) AS n FROM graft.main.nation
        |GROUP BY n_regionkey HAVING count(*) >= 999""".stripMargin)
    assert(spark.sql("SELECT * FROM big_nations").collect().isEmpty)

    // M8: drop removes it
    spark.sql("DROP VIEW big_nations")
    val after = spark.sql("SHOW VIEWS").collect().map(_.getString(1))
    assert(!after.contains("big_nations"))
  }

  test("catalog-persisted views: create/replace/drop/list cycle with governed base (r12 ask #5)") {
    import graft.plans.{ColumnMask, GovernancePolicies, TablePolicy}
    val dir = java.nio.file.Files.createTempDirectory("graft-views")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_vc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_vc.dir", dir)
    spark.sql("CREATE TABLE graft_vc.main.base AS " +
      "SELECT * FROM VALUES (1, 100, 'a'), (2, 200, 'b'), (3, 300, 'c') AS v(k, amt, who)")

    // create + query-through: the view is pure metadata (one JSON sidecar)
    spark.sql("CREATE VIEW graft_vc.main.v AS " +
      "SELECT k, amt * 2 AS amt2 FROM graft_vc.main.base WHERE k <= 2")
    assert(new java.io.File(s"$dir/v.graftview.json").isFile)
    val got = spark.sql("SELECT k, amt2 FROM graft_vc.main.v ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 200), (2, 400)), s"got $got")

    // listed alongside tables; name is occupied for CREATE TABLE
    val listed = spark.sql("SHOW TABLES IN graft_vc.main").collect()
      .map(_.getString(1)).toSet
    assert(listed == Set("base", "v"), s"got $listed")
    // SHOW VIEWS lists only views (with pattern support)
    val shownViews = spark.sql("SHOW VIEWS IN graft_vc.main").collect()
      .map(_.getString(1)).toSet
    assert(shownViews == Set("v"), s"got $shownViews")
    assert(spark.sql("SHOW VIEWS IN graft_vc.main LIKE 'nope*'").collect().isEmpty)
    intercept[Exception] { spark.sql("CREATE TABLE graft_vc.main.v AS SELECT 1 AS x") }
    intercept[Exception] {
      spark.sql("CREATE VIEW graft_vc.main.v AS SELECT 1 AS x")
    }
    // IF NOT EXISTS tolerates; OR REPLACE swaps the definition
    spark.sql("CREATE VIEW IF NOT EXISTS graft_vc.main.v AS SELECT 1 AS x")
    assert(spark.sql("SELECT count(*) FROM graft_vc.main.v").head().getLong(0) == 2)
    spark.sql("CREATE OR REPLACE VIEW graft_vc.main.v AS " +
      "SELECT k, amt * 3 AS amt3 FROM graft_vc.main.base WHERE k = 3")
    assert(spark.sql("SELECT amt3 FROM graft_vc.main.v").head().getInt(0) == 900)

    // ALTER VIEW ... AS replaces the stored definition in place (and back)
    spark.sql("ALTER VIEW graft_vc.main.v AS " +
      "SELECT k, amt * 4 AS amt3 FROM graft_vc.main.base WHERE k = 3")
    assert(spark.sql("SELECT amt3 FROM graft_vc.main.v").head().getInt(0) == 1200)
    spark.sql("ALTER VIEW graft_vc.main.v AS " +
      "SELECT k, amt * 3 AS amt3 FROM graft_vc.main.base WHERE k = 3")
    assert(spark.sql("SELECT amt3 FROM graft_vc.main.v").head().getInt(0) == 900)
    intercept[Exception] {
      spark.sql("ALTER VIEW graft_vc.main.never_was AS SELECT 1 AS x")
    }

    // governance on the BASE table applies beneath the view, at the
    // reading user's current epoch (registered AFTER the view was created)
    GovernancePolicies.register("main.base",
      TablePolicy(masks = Seq(ColumnMask("amt", "0"))))
    try assert(spark.sql("SELECT amt3 FROM graft_vc.main.v").head().getInt(0) == 0,
      "view must re-resolve the governed base")
    finally GovernancePolicies.clear()

    // a view referencing a view resolves; a self-referencing view refuses
    spark.sql("CREATE VIEW graft_vc.main.vv AS SELECT amt3 + 1 AS a FROM graft_vc.main.v")
    assert(spark.sql("SELECT a FROM graft_vc.main.vv").head().getInt(0) == 901)
    spark.sql("CREATE VIEW graft_vc.main.loop AS SELECT 1 AS x")
    // overwrite the sidecar with a self-reference (simulates a bad
    // definition); drop the hadoop-local checksum so the raw write reads back
    new java.io.File(s"$dir/.loop.graftview.json.crc").delete()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/loop.graftview.json"),
      graft.catalog.GraftViews.render(
        "SELECT x FROM graft_vc.main.loop",
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("x",
            org.apache.spark.sql.types.IntegerType)))).getBytes("UTF-8"))
    spark.sessionState.catalogManager.catalog("graft_vc")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .invalidateTable(org.apache.spark.sql.connector.catalog.Identifier
        .of(Array("main"), "loop"))
    val e = intercept[Exception] { spark.sql("SELECT * FROM graft_vc.main.loop").collect() }
    assert(e.getMessage.toLowerCase.contains("recursive") ||
      e.getMessage.toLowerCase.contains("depth"), s"got $e")

    // drop removes the sidecar; DROP VIEW IF EXISTS tolerates absence
    spark.sql("DROP VIEW graft_vc.main.vv")
    spark.sql("DROP VIEW graft_vc.main.v")
    assert(!new java.io.File(s"$dir/v.graftview.json").exists)
    intercept[Exception] { spark.sql("SELECT * FROM graft_vc.main.v") }
    spark.sql("DROP VIEW IF EXISTS graft_vc.main.v")
    intercept[Exception] { spark.sql("DROP VIEW graft_vc.main.v") }
  }

  test("temp view over governed catalog table stays governed") {
    import graft.plans._
    GovernancePolicies.clear()
    GovernancePolicies.register("customer", TablePolicy(
      masks = Seq(ColumnMask("c_name", "md5(c_name)"))))
    try {
      spark.sql("CREATE OR REPLACE TEMPORARY VIEW cust_v AS " +
        "SELECT c_custkey, c_name FROM graft.main.customer")
      val rows = spark.sql("SELECT c_name FROM cust_v LIMIT 5").collect()
      assert(rows.nonEmpty && rows.forall(_.getString(0).matches("[0-9a-f]{32}")),
        "view must not bypass the mask")
      spark.catalog.dropTempView("cust_v")
    } finally GovernancePolicies.clear()
  }
}
