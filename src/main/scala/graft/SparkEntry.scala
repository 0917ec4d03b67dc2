package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CanaryQueries, ExtensionQueries, FunctionQueries, RelationalQueries, SurfaceQueries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query corpus lives in graft.queries.*; every key in `queries` with an entry in
  * `oracleSql` is hash-compared against DuckDB at sf0.01.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1-lite, SURVEY.md §7.1) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count("*").as("n"))
      .orderBy("l_returnflag")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ FunctionQueries.defs ++ ExtensionQueries.defs ++
      SurfaceQueries.defs ++ CanaryQueries.defs

  /** DuckDB-runnable oracle per query (omissions ⇒ rows-only check: sampling,
    * HLL sketches, SimHash fingerprints, approximate ANN).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ FunctionQueries.oracles ++ ExtensionQueries.oracles ++
      SurfaceQueries.oracles ++ CanaryQueries.oracles
}
