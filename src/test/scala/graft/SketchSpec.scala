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

  test("count_min_sketch: point estimates never undercount, overcount bounded by eps*N") {
    import org.apache.spark.util.sketch.CountMinSketch
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val eps = 0.001
    val conf = 0.99
    val bytes = li.agg(
      count_min_sketch(col("l_suppkey"), lit(eps), lit(conf), lit(42))
        .as("cms")).collect().head.getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    val n = li.count()
    val truth = li.groupBy("l_suppkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // CMS contract: estimate >= true count always (hash collisions only ADD),
    // and estimate <= true + eps*N with probability >= conf per key — on a
    // seeded sketch over a fixed fixture both sides are deterministic
    var overBound = 0
    truth.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS undercounted key $k: $est < $c")
      if (est > c + (eps * n).toLong) overBound += 1
    }
    assert(overBound <= math.max(1, ((1 - conf) * truth.length).toInt * 3),
      s"$overBound of ${truth.length} keys exceed the eps*N overcount bound")
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
