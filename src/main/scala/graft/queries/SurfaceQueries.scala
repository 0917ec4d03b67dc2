package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-2 surface closures: the operator rows SURVEY.md §2 lists that had no
  * corpus entry — map functions (F6), RANGE frames (W5), INTERSECT/EXCEPT ALL
  * (T5), last_value/nth_value (W3), band join (J10), OR-of-ranges pushdown (P6) —
  * plus the metadata/session surface: views (M3/M6-M8), catalog-resolved scans
  * with footer statistics (M1-M5/M9/M10), count(*) aggregate pushdown (S7), and
  * session-property limits (X1).
  */
object SurfaceQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  /** SQL through the graft DSv2 catalog (`graft.main.<t>`), exercising
    * M1/M2/M5/M10 on the correctness path.
    */
  private def catalogSql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerCatalog(s, dir); s.sql(q) }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- F6: map functions ----
    "q_map_funcs" -> ((s, d) => {
      val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      t(s, d, "part").select(
        col("p_partkey"),
        element_at(m, "brand").as("brand_v"),
        element_at(m, "type").as("type_v"),
        size(m).as("n"),
        map_keys(m).as("ks"),
        map_values(m).as("vs"))
    }),

    // ---- W5: RANGE BETWEEN frame (value-based, deterministic under ties) ----
    "q_window_range" -> sql(
      """SELECT o_orderkey,
        |  round(sum(o_totalprice) OVER (ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS range_sum
        |FROM orders""".stripMargin),

    // ---- W3 completion: last_value / nth_value over the full frame ----
    "q_window_lastval" -> sql(
      """SELECT o_orderkey,
        |  last_value(o_totalprice) OVER w AS lv,
        |  nth_value(o_totalprice, 2) OVER w AS nv
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin),

    // ---- T5: INTERSECT ALL / EXCEPT ALL ----
    "q_intersect_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))),

    "q_except_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .exceptAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))),

    // ---- J10: band (range) join ----
    "q_join_band" -> ((s, d) => {
      val a = t(s, d, "supplier").select(col("s_suppkey").as("sa"), col("s_acctbal").as("ba"))
      val b = t(s, d, "supplier").select(col("s_suppkey").as("sb"), col("s_acctbal").as("bb"))
      a.join(b, col("sa") < col("sb") &&
          col("bb").between(col("ba") - 100, col("ba") + 100))
        .select("sa", "sb")
    }),

    // ---- P6: OR-of-ranges predicate (pushed as one Or filter) ----
    "q_filter_or" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") < 2 || col("l_quantity") > 49 ||
          (col("l_discount") > 0.09 && col("l_quantity") < 5))
        .agg(count("*").as("n"), round(sum("l_extendedprice"), 2).as("s"))),

    // ---- M6/M7/M8: views — create, query through, drop ----
    "q_view_query" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("CREATE OR REPLACE TEMPORARY VIEW v_cust_rev AS " +
        "SELECT o_custkey, sum(o_totalprice) AS rev, count(*) AS n " +
        "FROM orders GROUP BY o_custkey")
      s.sql("SELECT c_nationkey, round(sum(rev), 2) AS nation_rev, sum(n) AS n_orders " +
        "FROM v_cust_rev JOIN customer ON c_custkey = o_custkey GROUP BY c_nationkey")
    }),

    // ---- M1-M5/M9/M10: catalog-resolved multi-table query ----
    "q_catalog_scan" -> catalogSql(
      """SELECT n_name, count(*) AS n_cust
        |FROM graft.main.customer c JOIN graft.main.nation n
        |  ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name""".stripMargin),

    // ---- S7: count(*) via aggregate pushdown (footer counts, no data read) ----
    "q_count_pushdown" -> catalogSql(
      "SELECT count(*) AS n FROM graft.main.lineitem"),

    // ---- X1: session-property limit applied at scan ----
    "q_session_limit" -> ((s, d) => {
      s.conf.set(graft.plans.SessionProps.LimitKey, "500")
      try t(s, d, "lineitem").agg(count("*").as("n"))
      finally s.conf.unset(graft.plans.SessionProps.LimitKey)
    }),

    // ---- A4 completion: percentile_approx (sketch-based ⇒ rows-only) ----
    "q_percentile_approx" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("p50_approx"))),

    // ---- LSH-blocked embedding dedup (approximate ⇒ rows-only) ----
    "q_dedup_embedding_ann" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      graft.operators.Dedup.embeddingPairs(
        t(s, d, "embeddings"), "vec_id", "embedding", threshold = 0.95)
        .select("vec_a", "vec_b")
    }),

    // ---- multimodal frame sampling (stubbed decode ⇒ rows-only) ----
    "q_multimodal_frames" -> ((s, d) =>
      graft.sources.Multimodal.sampleFrames(
        graft.sources.Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text"),
        everyK = 4)
        .groupBy("doc_id").agg(count("*").as("n_frames"))),

    // ---- IVF ANN: KMeans coarse quantizer + probe (approximate ⇒ rows-only) ----
    "q_sim_ivf" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      graft.operators.Similarity.ivfTopK(
        t(s, d, "embeddings"), "vec_id", "embedding", queryId = 0L, k = 10)
    }),

    // ---- multimodal mapPartitions feature kernel (stub decode ⇒ rows-only) ----
    "q_multimodal_features" -> ((s, d) =>
      graft.sources.Multimodal.featureExtract(
        graft.sources.Multimodal.asMedia(t(s, d, "documents"), "doc_id", "text"))
        .select(col("doc_id"), size(col("features")).as("dim"),
          round(element_at(col("features"), 1), 4).as("f0")))
  )

  val oracles: Map[String, String] = Map(
    "q_map_funcs" ->
      ("SELECT p_partkey, " +
        "map_extract(MAP {'brand': p_brand, 'type': p_type}, 'brand')[1] AS brand_v, " +
        "map_extract(MAP {'brand': p_brand, 'type': p_type}, 'type')[1] AS type_v, " +
        "cardinality(MAP {'brand': p_brand, 'type': p_type})::INTEGER AS n, " +
        "map_keys(MAP {'brand': p_brand, 'type': p_type}) AS ks, " +
        "map_values(MAP {'brand': p_brand, 'type': p_type}) AS vs FROM part"),

    "q_window_range" ->
      ("SELECT o_orderkey, round(sum(o_totalprice) OVER (ORDER BY o_totalprice " +
        "RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS range_sum FROM orders"),

    "q_window_lastval" ->
      ("SELECT o_orderkey, last_value(o_totalprice) OVER w AS lv, " +
        "nth_value(o_totalprice, 2) OVER w AS nv FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"),

    "q_intersect_all" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "INTERSECT ALL SELECT s_nationkey AS nk FROM supplier"),

    "q_except_all" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "EXCEPT ALL SELECT s_nationkey AS nk FROM supplier"),

    "q_join_band" ->
      ("SELECT a.s_suppkey AS sa, b.s_suppkey AS sb FROM supplier a JOIN supplier b " +
        "ON a.s_suppkey < b.s_suppkey " +
        "AND b.s_acctbal BETWEEN a.s_acctbal - 100 AND a.s_acctbal + 100"),

    "q_filter_or" ->
      ("SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS s FROM lineitem " +
        "WHERE l_quantity < 2 OR l_quantity > 49 " +
        "OR (l_discount > 0.09 AND l_quantity < 5)"),

    "q_view_query" ->
      ("WITH v_cust_rev AS (SELECT o_custkey, sum(o_totalprice) AS rev, count(*) AS n " +
        "FROM orders GROUP BY o_custkey) " +
        "SELECT c_nationkey, round(sum(rev), 2) AS nation_rev, sum(n)::BIGINT AS n_orders " +
        "FROM v_cust_rev JOIN customer ON c_custkey = o_custkey GROUP BY c_nationkey"),

    "q_catalog_scan" ->
      ("SELECT n_name, count(*) AS n_cust FROM customer c JOIN nation n " +
        "ON c.c_nationkey = n.n_nationkey GROUP BY n_name"),

    "q_count_pushdown" -> "SELECT count(*) AS n FROM lineitem",

    "q_session_limit" ->
      "SELECT count(*) AS n FROM (SELECT * FROM lineitem LIMIT 500)"
  )
}
