package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pipelines, Profiling}

/** Weighted sampling + histogram profiling invariants on crafted inputs (the
  * DuckDB oracle proves engine parity on the fixture).
  */
class ProfilingSpec extends SparkSpec {

  test("weightedSample: zero rate/weight keep nothing, supersets grow with rate, deterministic") {
    import spark.implicits._
    val docs = (0L until 400L).map(i => (i, (i % 5).toDouble / 2.0))
      .toDF("doc_id", "w")
    assert(Pipelines.weightedSample(docs, "doc_id", "w", 0.0).count() == 0)
    // weight 0 rows (i % 5 == 0) can never be kept at any rate
    val all = Pipelines.weightedSample(docs, "doc_id", "w", 1000.0)
      .collect().map(_.getLong(0)).toSet
    assert(all.forall(_ % 5 != 0), "zero-weight rows must never be kept")
    assert(all.size == 320, "rate*weight >= 1 keeps every positive-weight row")
    val lo = Pipelines.weightedSample(docs, "doc_id", "w", 0.3)
      .collect().map(_.getLong(0)).toSet
    val hi = Pipelines.weightedSample(docs, "doc_id", "w", 0.6)
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi), "raising the rate must only add rows (same draws)")
    val lo2 = Pipelines.weightedSample(docs, "doc_id", "w", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(lo == lo2, "kept-set must be exactly reproducible")
    // a doubled weight is kept at least as often as the original at half rate
    assert(lo.nonEmpty && hi.size > lo.size)
  }

  test("weightedSample: null and NaN weights drop — NaN must not pass every rate") {
    import spark.implicits._
    val docs = Seq(
      (1L, null.asInstanceOf[java.lang.Double]),
      (2L, java.lang.Double.valueOf(5.0)),
      (3L, java.lang.Double.valueOf(Double.NaN)))
      .toDF("doc_id", "w")
    val kept = Pipelines.weightedSample(docs, "doc_id", "w", 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L) && kept.contains(2L))
    assert(!kept.contains(3L), "NaN weight must never be kept")
    // the bug shape: under NaN-is-largest ordering an unfiltered NaN weight
    // passes even rate 0
    assert(Pipelines.weightedSample(docs, "doc_id", "w", 0.0).count() == 0)
  }

  test("summary: nulls counted, distincts exclude nulls, string min/max omitted, one row per column") {
    import spark.implicits._
    val df = Seq((1L, Some(10), Some("a")), (2L, Some(10), Some("b")),
      (3L, None, Some("b")), (4L, Some(30), None))
      .toDF("id", "v", "s")
    val rows = Profiling.summary(df, Seq("id", "v", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
    assert(rows.keySet == Set("id", "v", "s"))
    assert(rows("id") == ((4L, 0L, 4L, Some(1.0), Some(4.0))))
    // v: one null row; distinct over non-null values {10, 30} = 2
    assert(rows("v") == ((4L, 1L, 2L, Some(10.0), Some(30.0))))
    // s: string column — min/max omitted (engine-private collation)
    assert(rows("s") == ((4L, 1L, 2L, None, None)))
  }

  test("histogram: exact edges, clamping, null and NaN buckets, counts total") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[Any](-5.0, 0.0, 9.999, 10.0, 55.0, 99.9, 100.0, 250.0, null, Double.NaN)
        .map(v => if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double]))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val h = Profiling.histogram(df, "x", lo = 0.0, hi = 100.0, n = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(h.values.sum == vals.size, "histogram accounts for every row")
    assert(h(-1) == 1, "null bucket")
    assert(h(-2) == 1, "NaN bucket — NaN must not clamp into bucket 0")
    assert(h(0) == 3, "-5 clamps into bucket 0; 0.0 and 9.999 belong there")
    assert(h(1) == 1, "10.0 is the left edge of bucket 1")
    assert(h(5) == 1)
    assert(h(9) == 3, "99.9 plus the clamped 100.0 and 250.0")
  }
}
