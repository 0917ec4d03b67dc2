package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.sources.Tables

/** Scalar-function surface (SURVEY.md §2.8) + UDF/UDAF/UDTF proof (§2.10).
  * DuckDB-dialect notes encoded in the oracles: year()/length()/floor()/ntile()
  * return BIGINT/DOUBLE there — cast to match Spark's INT/LONG outputs;
  * regexp_replace needs the 'g' flag to match Spark's replace-all default.
  */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("ub"),
        lower(col("p_type")).as("lt"),
        substring(col("p_name"), 1, 8).as("pre"),
        length(col("p_name")).as("len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("cat"),
        regexp_replace(col("p_name"), " ", "_").as("und"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        reverse(col("p_brand")).as("rev"))),

    "q_date_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        col("o_orderdate").cast("date").as("od"))),

    "q_math_funcs" -> ((s, d) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        round(abs(-col("o_totalprice")), 2).as("a"),
        floor(col("o_totalprice")).as("fl"),
        ceil(col("o_totalprice")).as("ce"),
        round(sqrt(col("o_totalprice")), 4).as("sq"),
        round(log(col("o_totalprice")), 4).as("lg"),
        round(pow(col("o_totalprice"), 0.5), 4).as("pw"),
        (col("o_orderkey") % 97).as("md"))),

    "q_case_expr" -> ((s, d) =>
      t(s, d, "orders")
        .select(when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("bucket"))
        .groupBy("bucket").agg(count("*").as("n"))),

    "q_json_funcs" -> ((s, d) =>
      t(s, d, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("k").agg(count("*").as("n"))),

    "q_array_funcs" -> ((s, d) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        round(sqrt(expr(
          "aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")),
          4).as("l2_norm"))),

    // UDAF surface proof: typed Aggregator (geometric mean)
    "q_udaf_geomean" -> ((s, d) => {
      GraftFunctions.register(s)
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(GraftFunctions.geoMean(col("l_extendedprice")), 2).as("gm"))
    }),

    // UDTF surface proof: custom Generator (word n-grams)
    "q_udtf_ngrams" -> ((s, d) => {
      GraftFunctions.register(s)
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), GraftFunctions.wordNGrams(col("text"), 2))
    }),

    // scalar UDF parity with the reference's current_database()
    // (trino/udfs/CurrentDatabaseUdf.java:10-17)
    "q_current_engine" -> ((s, d) => {
      GraftFunctions.register(s)
      t(s, d, "region").agg(count("*").as("n"))
        .select(GraftFunctions.currentEngine().as("engine"), col("n"))
    }),

    // exact interpolated percentile (approx variant is rows-only-checked)
    "q_percentile" -> ((s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90")))
  )

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      ("SELECT p_partkey, upper(p_brand) AS ub, lower(p_type) AS lt, " +
        "substring(p_name, 1, 8) AS pre, length(p_name)::INTEGER AS len, " +
        "p_brand || '#' || p_type AS cat, " +
        "regexp_replace(p_name, ' ', '_', 'g') AS und, " +
        "lpad(p_size::VARCHAR, 4, '0') AS padded, reverse(p_brand) AS rev FROM part"),

    "q_date_funcs" ->
      ("SELECT o_orderkey, year(o_orderdate)::INTEGER AS y, " +
        "month(o_orderdate)::INTEGER AS m, day(o_orderdate)::INTEGER AS dom, " +
        "quarter(o_orderdate)::INTEGER AS q, dayofyear(o_orderdate)::INTEGER AS doy, " +
        "date_trunc('month', o_orderdate)::DATE AS month_start, " +
        "o_orderdate::DATE AS od FROM orders"),

    "q_math_funcs" ->
      ("SELECT o_orderkey, round(abs(-o_totalprice), 2) AS a, " +
        "floor(o_totalprice)::BIGINT AS fl, ceil(o_totalprice)::BIGINT AS ce, " +
        "round(sqrt(o_totalprice), 4) AS sq, round(ln(o_totalprice), 4) AS lg, " +
        "round(pow(o_totalprice, 0.5), 4) AS pw, o_orderkey % 97 AS md FROM orders"),

    "q_case_expr" ->
      ("SELECT CASE WHEN o_totalprice < 100000 THEN 'low' " +
        "WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS bucket, " +
        "count(*) AS n FROM orders GROUP BY 1"),

    "q_json_funcs" ->
      ("SELECT json_extract_string(props, '$.k')::INTEGER AS k, count(*) AS n " +
        "FROM events GROUP BY 1"),

    "q_array_funcs" ->
      // `+ 0` folds DuckDB's negative zero to +0.0 (Spark's round never emits -0.0)
      ("SELECT vec_id, len(embedding)::INTEGER AS dim, " +
        "round(embedding[1]::DOUBLE, 4) + 0 AS first_val, " +
        "round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS l2_norm " +
        "FROM embeddings"),

    "q_udaf_geomean" ->
      ("SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 2) AS gm " +
        "FROM lineitem GROUP BY 1"),

    "q_udtf_ngrams" ->
      ("WITH w AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ws " +
        "FROM documents WHERE doc_id < 20) " +
        "SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS ngram " +
        "FROM w, range(1, 100000) r(i) WHERE i <= len(ws) - 1"),

    "q_current_engine" ->
      "SELECT 'graft' AS engine, count(*) AS n FROM region",

    "q_percentile" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
        "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90 FROM lineitem GROUP BY 1")
  )
}
