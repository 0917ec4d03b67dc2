package graft

import org.apache.spark.sql.functions._

/** Error-bound checks for the approximate aggregates (A3/A4). These queries are
  * rows-only in the DuckDB compare (a sketch has no exact oracle), so the specs
  * pin the documented error contracts instead: HLL++'s relative standard
  * deviation and percentile_approx's deterministic rank-error bound.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct is within the configured rsd of exact (A3)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rsd = 0.05
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd).as("approx")).collect().head
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    val relErr = math.abs(approx - exact) / exact
    // rsd is one standard deviation; 3x is a deterministic-in-practice margin
    // (the sketch is seeded, so this never flakes on a fixed fixture)
    assert(relErr <= 3 * rsd, s"relative error $relErr exceeds 3*rsd=${3 * rsd}")
  }

  test("percentile_approx honors the deterministic rank-error bound (A4)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val accuracy = 1000
    val n = li.count()
    val v = li.agg(
      expr(s"percentile_approx(l_extendedprice, 0.5, $accuracy)").as("p50"))
      .collect().head.getDouble(0)
    // GK-sketch contract: the returned value's true rank is within n/accuracy
    // of the requested rank — a hard bound, not probabilistic
    val rank = li.filter(col("l_extendedprice") <= v).count()
    val rankErr = math.abs(rank - 0.5 * n)
    assert(rankErr <= n.toDouble / accuracy,
      s"rank error $rankErr exceeds n/accuracy=${n.toDouble / accuracy} (n=$n)")
  }
}
