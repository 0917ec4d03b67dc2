package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-system coverage (SURVEY.md §1.2): the full Spark-side mapping —
  * primitives, DECIMAL, DATE/TIMESTAMP, ARRAY, MAP, nested RECORD — must
  * round-trip through the graft catalog and stay queryable, including the
  * row-oriented reader path for nested schemas (reference S3:
  * trino/RecordServiceRecordSet.java) next to the vectorized one (S2).
  */
class TypesSpec extends SparkSpec {

  test("nested/decimal/map schema round-trips through the catalog") {
    val dir = Files.createTempDirectory("graft-types").toFile.getAbsolutePath
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("b", BooleanType),
      StructField("i8", ByteType),
      StructField("i16", ShortType),
      StructField("i32", IntegerType),
      StructField("f32", FloatType),
      StructField("f64", DoubleType),
      StructField("dec", DecimalType(12, 2)),
      StructField("d", DateType),
      StructField("ts", TimestampType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("rec", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType))))))
    val rows = java.util.Arrays.asList(
      Row(1L, true, 1.toByte, 2.toShort, 3, 1.5f, 2.5, BigDecimal("1234567.89").bigDecimal,
        java.sql.Date.valueOf("2024-02-29"), java.sql.Timestamp.valueOf("2024-02-29 12:34:56.789"),
        "hello", Array[Byte](1, 2, 3), Seq(1, 2, 3), Map("a" -> 1L, "b" -> 2L), Row(7, "seven")),
      Row(2L, false, null, null, null, null, null, null,
        null, null, null, null, null, null, Row(8, "eight")))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$dir/typed.parquet")

    spark.conf.set("spark.sql.catalog.graft_types", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_types.dir", dir)

    val t = spark.table("graft_types.main.typed")
    assert(t.schema("dec").dataType == DecimalType(12, 2))
    assert(t.schema("rec").dataType.isInstanceOf[StructType])

    // nested access through SQL (row-oriented reader path)
    val r = spark.sql(
      """SELECT id, rec.x AS x, rec.y AS y, m['a'] AS ma, arr[1] AS a1,
        |  dec + 0.11 AS dec2, year(d) AS yr
        |FROM graft_types.main.typed ORDER BY id""".stripMargin).collect()
    assert(r(0).getInt(1) == 7 && r(0).getString(2) == "seven")
    assert(r(0).getLong(3) == 1L)
    assert(r(0).getInt(4) == 2)
    assert(r(0).getDecimal(5).toString == "1234568.00")
    assert(r(0).getInt(6) == 2024)
    // null row: nested struct still reads, scalars are null
    assert(r(1).getInt(1) == 8)
    assert(r(1).isNullAt(3) && r(1).isNullAt(4) && r(1).isNullAt(5))

    // aggregate over nested + map values
    val agg = spark.sql(
      "SELECT sum(rec.x) AS sx FROM graft_types.main.typed").collect().head
    assert(agg.getLong(0) == 15L)
  }

  test("fixture schemas map to the expected Spark types") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem").schema
    assert(li("l_orderkey").dataType == LongType)
    assert(li("l_linenumber").dataType == IntegerType)
    assert(li("l_quantity").dataType == DoubleType)
    assert(li("l_returnflag").dataType == StringType)
    // fixture parquet writes isAdjustedToUTC=false → NTZ; both are µs timestamps
    assert(li("l_shipdate").dataType == TimestampType ||
      li("l_shipdate").dataType == TimestampNTZType)
    val emb = graft.sources.Tables(spark, sfDir, "embeddings").schema
    assert(emb("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      emb("embedding").dataType == ArrayType(FloatType, containsNull = false))
    // events.ts is ns in storage, µs TimestampType after Tables truncation
    val ev = graft.sources.Tables(spark, sfDir, "events").schema
    assert(ev("ts").dataType == TimestampType)
  }
}
