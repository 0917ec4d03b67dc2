package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.plans.{ColumnMask, Governance, GovernancePolicies, TablePolicy}
import graft.sources.Tables

/** Governance (SURVEY.md §2.12 X4) must hold on EVERY access path — SQL over a
  * temp view, catalog-resolved identifiers, and raw-path DataFrame reads. A path
  * that returns unmasked data is a policy bypass, the one failure a governance
  * layer cannot have.
  */
class GovernanceSpec extends SparkSpec with BeforeAndAfterEach {

  private val policy = TablePolicy(
    dropColumns = Seq("c_acctbal"),
    masks = Seq(ColumnMask("c_name", "md5(c_name)")),
    rowFilterSql = Some("c_nationkey < 10"))

  override def beforeEach(): Unit = GovernancePolicies.clear()
  override def afterEach(): Unit = GovernancePolicies.clear()

  /** A governed result must never expose c_acctbal values (column either absent —
    * schema-level drop — or NULL-redacted), must mask c_name, and must row-filter.
    */
  private def assertGoverned(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty)
    val acctIdx = df.columns.indexWhere(_.equalsIgnoreCase("c_acctbal"))
    if (acctIdx >= 0)
      assert(rows.forall(_.isNullAt(acctIdx)), "no-access column values leaked")
    val nkIdx = df.columns.indexWhere(_.equalsIgnoreCase("c_nationkey"))
    assert(rows.forall(r => r.getAs[Number](nkIdx).longValue < 10), "row filter bypassed")
    val nameIdx = df.columns.indexWhere(_.equalsIgnoreCase("c_name"))
    assert(rows.forall(r => r.getString(nameIdx).matches("[0-9a-f]{32}")),
      "mask bypassed (c_name not md5)")
  }

  test("extension operators inherit governance: dedup and fuzzy join see only permitted rows") {
    // a row-filter policy on documents/customer must constrain EVERY extension
    // operator built over Tables() — otherwise dedup/similarity pipelines are
    // a governance bypass
    GovernancePolicies.register("documents",
      TablePolicy(rowFilterSql = Some("doc_id < 100")))
    val survivors = graft.operators.Dedup.exact(
      Tables(spark, sfDir, "documents"), "doc_id", "text")
      .collect().map(_.getLong(0))
    assert(survivors.nonEmpty && survivors.forall(_ < 100),
      "dedup must only consider rows the policy permits")

    GovernancePolicies.register("customer",
      TablePolicy(rowFilterSql = Some("c_custkey <= 50")))
    val pairs = graft.operators.FuzzyJoin.pairsWithin1(
      Tables(spark, sfDir, "customer"), "c_custkey", "c_name")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "ids 1..50 contain distance-1 name pairs")
    assert(pairs.forall { case (a, b) => a <= 50 && b <= 50 },
      "fuzzy join must not pair governed-out rows")
  }

  test("DataFrame composition API applies drop/mask/filter") {
    val df = Governance.secure(Tables(spark, sfDir, "customer"), policy)
    assert(!df.columns.map(_.toLowerCase).contains("c_acctbal"),
      "composition API drops the column from the schema")
    assertGoverned(df)
  }

  test("analyzer rule governs raw spark.read.parquet path") {
    GovernancePolicies.register("customer", policy)
    assertGoverned(spark.read.parquet(s"$sfDir/customer.parquet"))
  }

  test("analyzer rule governs SQL over a temp view") {
    GovernancePolicies.register("customer", policy)
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("customer")
    assertGoverned(spark.sql("SELECT * FROM customer"))
    // and through a projection that references a masked column
    val one = spark.sql("SELECT c_name FROM customer").collect()
    assert(one.forall(_.getString(0).matches("[0-9a-f]{32}")))
    spark.catalog.dropTempView("customer")
  }

  test("analyzer rule governs catalog-resolved graft.main.customer") {
    GovernancePolicies.register("customer", policy)
    assertGoverned(spark.sql("SELECT * FROM graft.main.customer"))
  }

  test("policy is applied exactly once (no double masking via view over path)") {
    GovernancePolicies.register("customer", policy)
    spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("customer")
    val viaSql = spark.sql("SELECT c_name FROM customer ORDER BY c_custkey LIMIT 5")
      .collect().map(_.getString(0))
    GovernancePolicies.clear()
    val raw = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_nationkey") < 10)
      .orderBy("c_custkey").select(md5(col("c_name"))).limit(5)
      .collect().map(_.getString(0))
    assert(viaSql.sameElements(raw), "mask must be md5(raw), not md5(md5(raw))")
    spark.catalog.dropTempView("customer")
  }

  test("ungoverned tables are untouched") {
    GovernancePolicies.register("customer", policy)
    val nation = Tables(spark, sfDir, "nation")
    assert(nation.columns.contains("n_name"))
    assert(nation.count() == 25)
  }

  test("per-user policy applies to the delegated user only (X3)") {
    import graft.plans.Users
    val me = spark.sparkContext.sparkUser
    GovernancePolicies.registerFor("analyst",
      "customer", TablePolicy(rowFilterSql = Some("c_nationkey = 1")))
    // the grant comes from the STATIC conf set at context build (SparkSpec):
    // "<me>:analyst" — nothing to set at runtime
    assert(spark.sparkContext.getConf.get(Users.DelegationKey).startsWith(me))
    try {
      // as the authenticated user: no policy, full table
      val all = spark.read.parquet(s"$sfDir/customer.parquet").count()
      // impersonate analyst: row filter applies
      spark.conf.set(Users.UserKey, "analyst")
      val filtered = spark.read.parquet(s"$sfDir/customer.parquet")
      val rows = filtered.collect()
      assert(rows.length < all)
      val nk = filtered.columns.indexWhere(_.equalsIgnoreCase("c_nationkey"))
      assert(rows.forall(_.getAs[Number](nk).longValue == 1))
    } finally {
      spark.conf.unset(Users.UserKey)
    }
  }

  test("delegation to a non-allow-listed target is denied") {
    import graft.plans.Users
    GovernancePolicies.register("customer", policy)
    // static conf allows "<me>:analyst" only — someone_else is out of scope
    spark.conf.set(Users.UserKey, "someone_else")
    try {
      val e = intercept[Exception] {
        spark.read.parquet(s"$sfDir/customer.parquet").collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[SecurityException]),
        s"expected SecurityException, got $e")
    } finally spark.conf.unset(Users.UserKey)
  }

  test("ns-qualified policy governs only its namespace's table, not a same-basename sibling (r12 ask #8)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gov-ns")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_gn", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gn.dir", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_gn.ns2")
    spark.sql("CREATE TABLE graft_gn.main.acct AS SELECT 100 AS bal, 'alice' AS who")
    spark.sql("CREATE TABLE graft_gn.ns2.acct  AS SELECT 200 AS bal, 'bob' AS who")

    // epoch guard: both tables were already analyzed/loaded BEFORE the policy
    assert(spark.sql("SELECT bal FROM graft_gn.main.acct").head().getInt(0) == 100)
    assert(spark.sql("SELECT bal FROM graft_gn.ns2.acct").head().getInt(0) == 200)

    GovernancePolicies.register("ns2.acct",
      TablePolicy(masks = Seq(ColumnMask("bal", "-1"))))
    // ns2's table is masked...
    assert(spark.sql("SELECT bal FROM graft_gn.ns2.acct").head().getInt(0) == -1,
      "ns-qualified policy must apply to its own table (post-registration epoch)")
    // ...while main's SAME-BASENAME table is untouched — the basename
    // fallback must not smear an ns-qualified policy across namespaces
    assert(spark.sql("SELECT bal FROM graft_gn.main.acct").head().getInt(0) == 100,
      "policy for ns2.acct leaked onto main.acct")
    // a BARE-name policy still governs both (the pre-namespace form)
    GovernancePolicies.register("acct",
      TablePolicy(masks = Seq(ColumnMask("bal", "0"))))
    assert(spark.sql("SELECT bal FROM graft_gn.main.acct").head().getInt(0) == 0)
    // qualified key wins over bare for ns2
    assert(spark.sql("SELECT bal FROM graft_gn.ns2.acct").head().getInt(0) == -1)
  }

  test("replacing mutations refuse on governed tables — a policy can never cause silent destruction (r13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gov-dml")
      .toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_gd", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_gd.dir", dir)
    spark.sql("CREATE TABLE graft_gd.main.t AS SELECT id, id * 2 AS v FROM range(0, 100)")

    def intactAfter(policyShape: TablePolicy)(mutations: String*): Unit = {
      GovernancePolicies.register("t", policyShape)
      try mutations.foreach { sql =>
        val e = intercept[Exception] { spark.sql(sql) }
        // the loud governance refusal, or — for statements referencing a
        // schema-DROPPED column — the analyzer's own unresolved-column /
        // arity error, which fires before any rule can phrase it; all REFUSE
        assert(e.getMessage.contains("governed table") ||
            e.getMessage.contains("cannot be resolved") ||
            e.getMessage.contains("Cannot write"),
          s"expected a refusal for [$sql], got: ${e.getMessage.take(200)}")
      } finally GovernancePolicies.clear()
      // the load-bearing half: NOTHING was destroyed — full contents intact
      assert(spark.sql("SELECT count(*) FROM graft_gd.main.t").head().getLong(0) == 100)
      assert(spark.sql("SELECT count(*) FROM graft_gd.main.t WHERE v = id * 2")
        .head().getLong(0) == 100, "hidden values must survive a refused mutation")
    }

    val all = Seq(
      "DELETE FROM graft_gd.main.t WHERE id = 10",
      "UPDATE graft_gd.main.t SET v = -1 WHERE id = 10",
      """MERGE INTO graft_gd.main.t t USING (SELECT 10 AS id, -1 AS v) s
        |ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin,
      "INSERT OVERWRITE graft_gd.main.t SELECT id, id * 2 AS v FROM range(0, 5)",
      "TRUNCATE TABLE graft_gd.main.t")
    // every policy SHAPE would destroy differently: a row filter loses the
    // hidden rows, a mask bakes masked values over the originals, a column
    // drop nulls the hidden column — all must refuse identically
    intactAfter(TablePolicy(rowFilterSql = Some("id < 50")))(all: _*)
    intactAfter(TablePolicy(masks = Seq(ColumnMask("v", "-1"))))(all: _*)
    intactAfter(TablePolicy(dropColumns = Seq("v")))(all: _*)

    // plain INSERT (append) stays allowed under a policy: appends cannot
    // destroy hidden data, and a governed READ immediately reflects policy
    GovernancePolicies.register("t", TablePolicy(rowFilterSql = Some("id < 50")))
    try {
      spark.sql("INSERT INTO graft_gd.main.t VALUES (7, 14)")
      assert(spark.sql("SELECT count(*) FROM graft_gd.main.t").head().getLong(0) == 51)
    } finally GovernancePolicies.clear()
    assert(spark.sql("SELECT count(*) FROM graft_gd.main.t").head().getLong(0) == 101)
  }

  test("runtime conf cannot self-grant delegation rights") {
    import graft.plans.Users
    GovernancePolicies.register("customer", policy)
    // an attacker that can set graft.user tries to widen the allow-list via the
    // session conf; the gate must keep reading the immutable context conf
    val me = spark.sparkContext.sparkUser
    spark.conf.set(Users.DelegationKey, s"$me:someone_else,$me")
    spark.conf.set(Users.UserKey, "someone_else")
    try {
      val e = intercept[Exception] {
        spark.read.parquet(s"$sfDir/customer.parquet").collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[SecurityException]),
        s"runtime conf must not grant delegation, got $e")
    } finally {
      spark.conf.unset(Users.UserKey)
      spark.conf.unset(Users.DelegationKey)
    }
  }
}
