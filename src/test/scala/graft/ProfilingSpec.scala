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

  test("keySkew: heaviest keys first, null keys surfaced, basis points floor") {
    import spark.implicits._
    // key a: 6 rows, b: 3, null: 1 → shares 6000/3000/1000 bp of 10 rows
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(3)(Some("b")) ++ Seq(None))
      .toDF("k")
    val top = Profiling.keySkew(df, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq(("a", 6L, 6000L), ("b", 3L, 3000L)))
    val all = Profiling.keySkew(df, "k", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(all.contains(("<null>", 1L, 1000L)), s"null keys must surface: ${all.toSeq}")
  }

  test("wordEntropy: zero for constant docs, log2(n) for all-distinct docs, zero-word docs dropped") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq((1L, "spam spam spam spam"), (2L, "a b c d"),
      (3L, "x x y y"), (4L, "   ")).toDF("doc_id", "text")
    val got = TextAnalysis.wordEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(!got.contains(4L), "whitespace-only docs have no words")
    assert(got(1L) == ((4L, 0.0)), s"constant doc must score H=0: ${got(1L)}")
    // 4 distinct words, uniform → H = log2(4) = 2 exactly
    assert(got(2L) == ((4L, 2.0)), s"uniform all-distinct doc: ${got(2L)}")
    // two words at p=1/2 each → H = 1
    assert(got(3L) == ((4L, 1.0)), s"two uniform words: ${got(3L)}")
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
