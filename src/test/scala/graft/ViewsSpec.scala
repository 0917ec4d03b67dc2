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
