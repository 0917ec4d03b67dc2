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

  test("GWARC round-trip: unicode urls, µs timestamps, null payloads") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    ts.setNanos(123456000) // µs fidelity below the ms the Timestamp ctor sets
    val recs = Seq(
      (1L, "https://example.com/a?q=1", ts, "<html><p>plain page</p></html>"),
      (2L, "https://example.com/ümlaut/путь", ts, "körper — тело <b>x</b>"),
      (3L, "https://example.com/empty", ts, ""),
      (4L, "https://example.com/missing", ts, null.asInstanceOf[String]))
      .toDF("record_id", "url", "fetch_ts", "html")
    val dir = tmp("gwarc") + "/out"
    graft.sources.Warc.write(recs, dir)
    val back = graft.sources.Warc.read(spark, dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("record_id", "url", "fetch_ts", "html"))
    assert(canon(back) == canon(recs))
    // µs survive: the read-back timestamp is bit-identical
    val t2 = back.filter(col("record_id") === 2L).head().getTimestamp(2)
    assert(t2.getNanos == 123456000, s"µs lost: ${t2.getNanos}")
  }

  test("GWARC corrupt tail: the walk salvages the valid prefix, never throws") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val recs = (1L to 5L).map(i => (i, s"https://x.example/$i", ts, s"<p>page $i</p>"))
      .toDF("record_id", "url", "fetch_ts", "html").coalesce(1)
    val dir = tmp("gwarcbad") + "/out"
    graft.sources.Warc.write(recs, dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".gwarc")).get
    // the tampering below simulates a crashed WRITER, so drop the local-FS
    // checksum sidecars (a real crawl bucket has none; Hadoop's local
    // ChecksumFileSystem would otherwise flag our own edit, not the format)
    def dropCrc(): Unit = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    // append garbage: a bogus record magic followed by noise
    val out = new java.io.FileOutputStream(file, true)
    out.write(Array.fill[Byte](64)(0x5a)); out.close()
    dropCrc()
    val salvaged = graft.sources.Warc.read(spark, dir)
      .collect().map(_.getLong(0)).sorted
    assert(salvaged.toSeq == (1L to 5L), s"got ${salvaged.toSeq}")
    // truncation MID-record: drop the file's last 7 bytes → last record lost,
    // earlier ones salvaged
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    java.nio.file.Files.write(file.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 64 - 7))
    dropCrc()
    val prefix = graft.sources.Warc.read(spark, dir)
      .collect().map(_.getLong(0)).sorted
    assert(prefix.toSeq == (1L to 4L), s"got ${prefix.toSeq}")
    // a file with the wrong header yields nothing (not an exception)
    java.nio.file.Files.write(file.toPath, "not a warc".getBytes)
    dropCrc()
    assert(graft.sources.Warc.read(spark, dir).count() == 0L)
  }

  test("GWARC speculative twin attempts: per-attempt temp + first-wins commit, byte-identical container") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-02-02 00:00:00")
    val rows = (1L to 7L).map(i =>
      org.apache.spark.sql.Row(i, s"https://spec.example/$i", ts,
        if (i == 4L) null else s"<p>page $i</p>"))
    val dir = tmp("gwarcspec")
    // two attempts of the SAME partition, as speculation launches them; the
    // second starts while the first's output is already committed (the zombie
    // / twin-attempt window) — it must neither interleave nor clobber
    val n1 = graft.sources.Warc.writePartitionFile(dir, 0, attempt = 11L, rows.iterator)
    val n2 = graft.sources.Warc.writePartitionFile(dir, 0, attempt = 12L, rows.iterator)
    assert(n1 == 7L && n2 == 7L)
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files.count(_ == "part-00000.gwarc") == 1)
    assert(!files.exists(_.contains(".tmp-")), s"uncommitted temp left: $files")
    // the committed container is byte-identical to a single clean attempt
    val ref = tmp("gwarcref")
    graft.sources.Warc.writePartitionFile(ref, 0, attempt = 1L, rows.iterator)
    val got = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "part-00000.gwarc").toPath)
    val want = java.nio.file.Files.readAllBytes(
      new java.io.File(ref, "part-00000.gwarc").toPath)
    assert(java.util.Arrays.equals(got, want), "twin-attempt container differs")
    // and the walked-back rows are the partition's rows exactly
    val back = graft.sources.Warc.read(spark, dir)
    assert(back.count() == 7L)
    assert(back.filter(col("html").isNull).select("record_id").head().getLong(0) == 4L)
    // full write(): staging sweep leaves no temp debris in the swapped dir
    val full = tmp("gwarcfull") + "/out"
    val df = rows.map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
      r.getString(3))).toDF("record_id", "url", "fetch_ts", "html")
    graft.sources.Warc.write(df, full)
    val outFiles = new java.io.File(full).listFiles().map(_.getName).toSeq
    assert(!outFiles.exists(_.contains(".tmp-")), s"debris: $outFiles")
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
