package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** File-format surface (SURVEY.md §2.1 S9/S10). The reference reads whatever
  * the storage layer serves and hands rows to the engine; Spark's DataFrame
  * reader/writer covers parquet (used throughout), ORC, CSV, and JSON out of
  * the box. These round-trips prove the non-parquet formats preserve schema
  * and values through our session wiring (extensions + UTC + ANSI), so a user
  * pointing the engine at csv/json/orc data gets the same results the parquet
  * path gives.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-fmt-$name").toString

  // fixed column order for value comparison; nation is small and typed
  // (ints + strings) without timestamps, so every format can carry it
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*)
      .collect()
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))).mkString("|"))
      .toSeq.sorted
  }

  test("ORC round-trip preserves schema and values") {
    val nation = Tables(spark, sfDir, "nation")
    val dir = tmp("orc")
    nation.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == nation.schema, "ORC must preserve the exact schema")
    assert(canon(back) == canon(nation))
  }

  test("CSV round-trip with header + explicit schema preserves values") {
    val nation = Tables(spark, sfDir, "nation")
    val dir = tmp("csv")
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    // CSV carries no types; reading back with the table's schema (the
    // metadata-driven path a catalog provides) restores them exactly
    val back = spark.read.schema(nation.schema).option("header", "true").csv(dir)
    assert(canon(back) == canon(nation))
  }

  test("JSON round-trip with explicit schema preserves values") {
    val nation = Tables(spark, sfDir, "nation")
    val dir = tmp("json")
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.schema(nation.schema).json(dir)
    assert(canon(back) == canon(nation))
  }

  test("Avro round-trip preserves schema and values (container files via AvroIo)") {
    // the spark-avro DataSource module is not bundled here, so the format is
    // proven through AvroIo (public Avro core + mapred libs): the same
    // standard splittable .avro container files any Avro reader consumes
    val nation = Tables(spark, sfDir, "nation")
    val dir = tmp("avro") + "/out"
    graft.sources.AvroIo.write(nation, dir)
    val back = graft.sources.AvroIo.read(spark, dir, nation.schema)
    assert(back.schema == nation.schema, "Avro must preserve the exact schema")
    assert(canon(back) == canon(nation))
  }

  test("Avro carries timestamps and nulls (events head) with µs fidelity") {
    val events = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "event_type", "value").limit(200)
    val dir = tmp("avroev") + "/out"
    graft.sources.AvroIo.write(events, dir)
    val back = graft.sources.AvroIo.read(spark, dir, events.schema)
    assert(canon(back) == canon(events))
  }

  test("non-parquet formats run the same query plan surface (filter+agg)") {
    val nation = Tables(spark, sfDir, "nation")
    val dir = tmp("orcq")
    nation.write.mode("overwrite").orc(dir)
    val got = spark.read.orc(dir)
      .filter(col("n_regionkey") < 3)
      .groupBy("n_regionkey").agg(count("*").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = nation
      .filter(col("n_regionkey") < 3)
      .groupBy("n_regionkey").agg(count("*").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
