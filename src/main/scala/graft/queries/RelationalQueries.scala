package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The engine-delegated relational surface (SURVEY.md §2.2-2.8): one query per
  * operator, paired with an ANSI-SQL oracle (DuckDB) in `oracles`.
  *
  * Conventions that keep the oracle hash-compare honest:
  *  - every computed double is `round(_, 2..4)` on BOTH sides (sums of doubles are
  *    order-sensitive in the last ulps);
  *  - raw column passthroughs are NOT rounded (identical bits from the same
  *    parquet);
  *  - integer-typed results are cast so Spark and DuckDB agree (DuckDB `sum(int)`
  *    is HUGEINT, `year()` is BIGINT, `floor()` is DOUBLE — all cast in the SQL);
  *  - window order-bys always end in a unique key so ranking is deterministic.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { Tables.registerAll(s, dir); s.sql(q) }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / filters / limits (reference §2.1-2.3: S1-S8, P1-P10, L1-L3) ----
    "q_scan_project" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_quantity") >= 49)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),

    "q_filter_in" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_linenumber").isin(1, 2, 3))
        .groupBy("l_returnflag").agg(count("*").as("n"))),

    "q_filter_range" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between("1997-01-01", "1998-12-31") &&
          col("l_quantity").between(10, 20))
        .agg(count("*").as("n"),
          min("l_extendedprice").as("min_price"),
          max("l_extendedprice").as("max_price"),
          min("l_shipdate").as("min_ship"))),

    "q_filter_null" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(when(expr("nullif(l_tax, 0.0)").isNull, 1)).as("n_null"),
        count(expr("nullif(l_tax, 0.0)")).as("n_notnull"))),

    "q_limit" -> ((s, d) =>
      t(s, d, "lineitem").limit(1000).agg(count("*").as("n"))),

    "q_topk_sort" -> ((s, d) =>
      t(s, d, "orders").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice").limit(15)),

    "q_count_star" -> ((s, d) => t(s, d, "lineitem").agg(count("*").as("n"))),

    "q_sample" -> ((s, d) =>
      // byte/row sampling ≈ reference S8 (okera_sampled_* catalogs); row counts are
      // engine-specific ⇒ no SQL oracle, rows-only check
      t(s, d, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .agg(count("*").as("n"))),

    // ---- aggregation (reference §2.5) ----
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        // money sums ride the exact-DECIMAL/BIGINT-cents idiom (r11 sf1
        // catch on q5_join — order-dependent double sums at scale);
        // quantity sums stay double: integral values are exact in IEEE
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          (round(sum(col("l_extendedprice").cast("decimal(30,8)")), 2) * 100)
            .cast("long").as("base_c2"),
          (round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,8)")), 2) * 100).cast("long").as("disc_c2"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          count("*").as("n"))),

    "q6_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate").between("1996-01-01", "1997-12-31") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg((round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(30,8)")), 2) * 100).cast("long").as("revenue_c2"))),

    "q_having" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count("*").as("n")).filter(col("n") > 100)),

    "q_distinct" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "q_agg_distinct" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("nparts"),
          countDistinct("l_suppkey").as("nsupps"))),

    "q_rollup" -> ((s, d) =>
      t(s, d, "lineitem").rollup("l_returnflag", "l_linestatus")
        .agg(count("*").as("n"), round(sum("l_quantity"), 2).as("sum_qty"))),

    "q_cube" -> ((s, d) =>
      t(s, d, "lineitem").cube("l_returnflag", "l_linestatus")
        .agg(count("*").as("n"), round(sum("l_quantity"), 2).as("sum_qty"))),

    "q_grouping_sets" -> sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),

    "q_approx_distinct" -> ((s, d) =>
      // HLL sketches are engine-specific ⇒ rows-only check
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"))),

    // ---- joins (reference §2.4; all engine-delegated there, built-in here) ----
    "q3_topk" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg((round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,8)")), 2) * 100).cast("long").as("revenue_c2"))
        .orderBy(col("revenue_c2").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    "q5_join" -> ((s, d) => {
      val r = t(s, d, "region"); val n = t(s, d, "nation")
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val l = t(s, d, "lineitem"); val su = t(s, d, "supplier")
      r.join(n, col("n_regionkey") === col("r_regionkey"))
        .join(c, col("c_nationkey") === col("n_nationkey"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        // revenue in BIGINT cents over an exact DECIMAL sum (r11 sf1 sweep
        // catch): round(sum(double), 2) is order-dependent in the last ulp
        // and at 10× rows the sum crossed a cent boundary between engines
        // (549463674.44 vs .43); the per-row product is IEEE-identical on
        // both engines, so casting IT to DECIMAL(30,8) and summing exactly
        // is engine-portable, and the BIGINT surface avoids the DECIMAL
        // rendering divergence the canaries pin
        .agg((round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,8)")), 2) * 100).cast("long").as("revenue_c2"),
          count("*").as("n"))
    }),

    "q_join_left" -> ((s, d) =>
      t(s, d, "nation").join(t(s, d, "customer"),
        col("c_nationkey") === col("n_nationkey"), "left")
        .groupBy("n_name").agg(count("c_custkey").as("n_cust"))),

    "q_join_right" -> ((s, d) =>
      t(s, d, "supplier").join(t(s, d, "nation"),
        col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy("n_name").agg(count("s_suppkey").as("n_supp"))),

    "q_join_full" -> ((s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("k")).distinct()
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("k")).distinct()
      cn.as("c").join(sn.as("s"), col("c.k") === col("s.k"), "full")
        .select(coalesce(col("c.k"), col("s.k")).as("nk"),
          col("c.k").isNotNull.as("has_cust"),
          col("s.k").isNotNull.as("has_supp"))
    }),

    "q_join_semi" -> ((s, d) =>
      t(s, d, "orders").join(
        t(s, d, "lineitem").filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count("*").as("n"))),

    "q_join_anti" -> ((s, d) =>
      t(s, d, "orders").join(
        t(s, d, "lineitem").filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
        .agg(count("*").as("n"))),

    "q_join_cross" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation")).select("r_name", "n_name")),

    "q_join_nonequi" -> ((s, d) => {
      val a = t(s, d, "supplier").select(col("s_suppkey").as("sa"), col("s_acctbal").as("ba"))
      val b = t(s, d, "supplier").select(col("s_suppkey").as("sb"), col("s_acctbal").as("bb"))
      a.join(b, col("ba") < col("bb")).select("sa", "sb")
    }),

    "q_broadcast_join" -> ((s, d) =>
      t(s, d, "lineitem").join(broadcast(t(s, d, "part")),
        col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg((round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,8)")), 2) * 100).cast("long").as("revenue_c2"),
          count("*").as("n"))),

    // ---- subqueries ----
    "q_scalar_subquery" -> sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice >= 0.98 * (SELECT max(o_totalprice) FROM orders)""".stripMargin),

    "q_in_subquery" -> sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""".stripMargin),

    "q_exists_corr" -> sql(
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
        |    AND o.o_totalprice > 300000)""".stripMargin),

    // ---- set operations (reference §2.7) ----
    "q_union_all" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .unionAll(t(s, d, "supplier").select(col("s_nationkey").as("nk")))),

    "q_union_distinct" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk"))).distinct()),

    "q_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))),

    "q_except" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))),

    // ---- window functions (reference §2.6) ----
    "q_window_rank" -> sql(
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey,
        |    row_number() OVER w AS rn,
        |    rank()       OVER w AS rnk,
        |    dense_rank() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |) WHERE rn <= 3""".stripMargin),

    // running money total in BIGINT cents over an exact DECIMAL window sum —
    // the r11 sf1-sweep idiom: round(sum(double)) is order-dependent and a
    // cumulative frame re-accumulates per row, so the exact sum is the only
    // scale-stable hash surface
    "q_window_running" -> sql(
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) * 100
        |    AS BIGINT) AS running_c2
        |FROM orders""".stripMargin),

    "q_window_leadlag" -> sql(
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice)  OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin),

    "q_window_ntile" -> sql(
      """SELECT o_orderkey,
        |  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket,
        |  round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr
        |FROM orders""".stripMargin)
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_quantity >= 49",

    "q_filter_in" ->
      ("SELECT l_returnflag, count(*) AS n FROM lineitem " +
        "WHERE l_returnflag IN ('A','R') AND l_linenumber IN (1,2,3) GROUP BY 1"),

    "q_filter_range" ->
      ("SELECT count(*) AS n, min(l_extendedprice) AS min_price, " +
        "max(l_extendedprice) AS max_price, min(l_shipdate) AS min_ship FROM lineitem " +
        "WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31' " +
        "AND l_quantity BETWEEN 10 AND 20"),

    "q_filter_null" ->
      ("SELECT count(*) FILTER (WHERE nullif(l_tax, 0.0) IS NULL) AS n_null, " +
        "count(nullif(l_tax, 0.0)) AS n_notnull FROM lineitem"),

    "q_limit" -> "SELECT count(*) AS n FROM (SELECT * FROM lineitem LIMIT 1000)",

    "q_topk_sort" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15",

    "q_count_star" -> "SELECT count(*) AS n FROM lineitem",

    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, " +
        "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2) * 100 " +
        "AS BIGINT) AS base_c2, " +
        "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(30,8))), 2) * 100 AS BIGINT) AS disc_c2, " +
        "round(avg(l_quantity), 2) AS avg_qty, count(*) AS n " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2"),

    "q6_filter" ->
      ("SELECT CAST(round(sum(CAST(l_extendedprice * l_discount " +
        "AS DECIMAL(30,8))), 2) * 100 AS BIGINT) AS revenue_c2 FROM lineitem " +
        "WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),

    "q_having" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY 1, 2 HAVING count(*) > 100"),

    "q_distinct" -> "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_agg_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS nparts, " +
        "count(DISTINCT l_suppkey) AS nsupps FROM lineitem GROUP BY 1"),

    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),

    "q_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),

    "q_grouping_sets" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())"),

    "q3_topk" ->
      ("SELECT o_orderkey, o_orderdate, " +
        "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(30,8))), 2) * 100 AS BIGINT) AS revenue_c2 " +
        "FROM customer JOIN orders ON c_custkey = o_custkey " +
        "JOIN lineitem ON o_orderkey = l_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' GROUP BY 1, 2 " +
        "ORDER BY revenue_c2 DESC, o_orderkey LIMIT 10"),

    "q5_join" ->
      ("SELECT n_name, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(30,8))), 2) * 100 AS BIGINT) AS revenue_c2, " +
        "count(*) AS n FROM region " +
        "JOIN nation ON n_regionkey = r_regionkey " +
        "JOIN customer ON c_nationkey = n_nationkey " +
        "JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey " +
        "GROUP BY 1"),

    "q_join_left" ->
      ("SELECT n_name, count(c_custkey) AS n_cust FROM nation " +
        "LEFT JOIN customer ON c_nationkey = n_nationkey GROUP BY 1"),

    "q_join_right" ->
      ("SELECT n_name, count(s_suppkey) AS n_supp FROM supplier " +
        "RIGHT JOIN nation ON s_nationkey = n_nationkey GROUP BY 1"),

    "q_join_full" ->
      ("SELECT coalesce(c.k, s.k) AS nk, c.k IS NOT NULL AS has_cust, " +
        "s.k IS NOT NULL AS has_supp FROM " +
        "(SELECT DISTINCT c_nationkey AS k FROM customer) c FULL JOIN " +
        "(SELECT DISTINCT s_nationkey AS k FROM supplier) s ON c.k = s.k"),

    "q_join_semi" ->
      ("SELECT count(*) AS n FROM orders WHERE o_orderkey IN " +
        "(SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)"),

    "q_join_anti" ->
      ("SELECT count(*) AS n FROM orders WHERE o_orderkey NOT IN " +
        "(SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49)"),

    "q_join_cross" -> "SELECT r_name, n_name FROM region CROSS JOIN nation",

    "q_join_nonequi" ->
      ("SELECT a.s_suppkey AS sa, b.s_suppkey AS sb FROM supplier a " +
        "JOIN supplier b ON a.s_acctbal < b.s_acctbal"),

    "q_broadcast_join" ->
      ("SELECT p_brand, CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) " +
        "AS DECIMAL(30,8))), 2) * 100 AS BIGINT) AS revenue_c2, " +
        "count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1"),

    "q_scalar_subquery" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
        "WHERE o_totalprice >= 0.98 * (SELECT max(o_totalprice) FROM orders)"),

    "q_in_subquery" ->
      ("SELECT c_custkey, c_name FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"),

    "q_exists_corr" ->
      ("SELECT c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o " +
        "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' " +
        "AND o.o_totalprice > 300000)"),

    "q_union_all" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "UNION ALL SELECT s_nationkey AS nk FROM supplier"),

    "q_union_distinct" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "UNION SELECT s_nationkey AS nk FROM supplier"),

    "q_intersect" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "INTERSECT SELECT s_nationkey AS nk FROM supplier"),

    "q_except" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "EXCEPT SELECT s_nationkey AS nk FROM supplier"),

    "q_window_rank" ->
      ("SELECT * FROM (SELECT c_nationkey, c_custkey, " +
        "(row_number() OVER w)::INTEGER AS rn, (rank() OVER w)::INTEGER AS rnk, " +
        "(dense_rank() OVER w)::INTEGER AS drnk " +
        "FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)" +
        ") WHERE rn <= 3"),

    "q_window_running" ->
      ("SELECT o_custkey, o_orderkey, CAST(round(sum(CAST(o_totalprice " +
        "AS DECIMAL(30,8))) OVER (" +
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) * 100 " +
        "AS BIGINT) AS running_c2 FROM orders"),

    "q_window_leadlag" ->
      ("SELECT o_custkey, o_orderkey, lag(o_totalprice) OVER w AS prev_price, " +
        "lead(o_totalprice) OVER w AS next_price, first_value(o_orderkey) OVER w AS first_ok " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"),

    "q_window_ntile" ->
      ("SELECT o_orderkey, " +
        "(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey))::INTEGER AS bucket, " +
        "round(percent_rank() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr FROM orders")
  )
}
