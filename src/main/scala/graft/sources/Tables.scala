package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access. The reference fetches externally-owned schemas from a
  * planner RPC (reference: trino/RecordServiceMetadata.java:769-815); our tables are
  * parquet directories resolved by name, schemas inferred from footers.
  *
  * Reads go through `spark.read.parquet`, i.e. Spark's DSv2 parquet source:
  * vectorized columnar decode for flat schemas and row-based for nested ones —
  * the same dispatch the reference implements by hand
  * (trino/RecordServicePageSourceProvider.java:56-65).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view so `spark.sql` corpora work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
