package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.Tables

/** Property-based pushdown round-trip (SURVEY.md §5.2): for random predicate
  * trees over lineitem — ranges, equality, IN, null checks, conjunction,
  * disjunction, the reference's pushable surface P3-P6 — the result must be
  * identical whether the parquet scan evaluates pushed filters or the engine
  * evaluates everything. Mirrors the reference's contract that pushdown is an
  * optimization, never a semantics change
  * (trino/RecordServiceSplitManagerImpl.java:299-424).
  */
class PushdownPropertySpec extends SparkSpec {

  private lazy val li: DataFrame = Tables(spark, sfDir, "lineitem").cache()

  private val leafGen: Gen[Column] = Gen.oneOf(
    Gen.choose(1.0, 50.0).map(v => col("l_quantity") <= v),
    Gen.choose(1.0, 50.0).map(v => col("l_quantity") > v),
    Gen.choose(0.0, 0.1).map(v => col("l_discount") === v),
    Gen.oneOf(Seq("A", "N", "R")).map(v => col("l_returnflag") === v),
    Gen.someOf(Seq(1, 2, 3, 4, 5)).suchThat(_.nonEmpty)
      .map(vs => col("l_linenumber").isin(vs.toSeq: _*)),
    Gen.const(col("l_tax").isNotNull),
    Gen.const(expr("nullif(l_tax, 0.0)").isNull),
    Gen.choose(0, 400).map(d => col("l_shipdate") <= date_add(lit("1995-01-01").cast("date"), d))
  )

  private def predGen(depth: Int): Gen[Column] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case (a, b) => a && b },
      2 -> Gen.zip(predGen(depth - 1), predGen(depth - 1)).map { case (a, b) => a || b },
      1 -> predGen(depth - 1).map(p => !p))

  test("random predicates: pushdown on == pushdown off (counts and checksum)") {
    val params = Gen.Parameters.default
    val preds = (0 until 25).flatMap { i =>
      predGen(2).apply(params, Seed(1000L + i))
    }
    assert(preds.size >= 20, "generator should rarely discard")
    preds.foreach { pred =>
      def run(): (Long, Long) = {
        val filtered = li.filter(pred)
          .agg(count("*"),
            coalesce(expr("bit_xor(xxhash64(l_orderkey, l_linenumber))"), lit(0L)))
          .collect().head
        (filtered.getLong(0), filtered.getLong(1))
      }
      spark.conf.set("spark.sql.parquet.filterPushdown", "true")
      val pushed = run()
      spark.conf.set("spark.sql.parquet.filterPushdown", "false")
      val residualOnly =
        try run()
        finally spark.conf.set("spark.sql.parquet.filterPushdown", "true")
      assert(pushed == residualOnly,
        s"pushdown changed semantics for predicate: $pred")
    }
  }
}
