package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Coverage-monitor family: exact state slicing invariance, the HLL
  * sketch's error bound and merge determinism, and null totality.
  */
class CoverageSpec extends SparkSpec {

  import spark.implicits._

  // 40 domains × ~250 fetches; every 4th fetch re-serves the domain's
  // cached page, so exact per-domain distincts are known by construction
  private lazy val corpus = spark.range(10000).select(
    col("id").as("doc_id"),
    concat(lit("dom"), pmod(col("id"), lit(40))).as("domain"),
    when(col("id") % 4 === 0,
      concat(lit("cached page of dom"), pmod(col("id"), lit(40))))
      .otherwise(concat(lit("unique doc "), col("id"))).as("text"))

  test("coverage: exact report; slicing into rounds never changes it") {
    val oneShot = Profiling.coverage(corpus, "text", "domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // ground truth recomputed independently (countDistinct on the raw
    // text, no fingerprint, no state machinery)
    val expected = corpus.groupBy("domain").agg(
      count(lit(1)).as("n_docs"),
      countDistinct("text").as("n_distinct"))
      .select(col("domain"), col("n_docs"), col("n_distinct"),
        expr("(n_docs - n_distinct) * 10000 div n_docs").as("dup_bp"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(oneShot == expected)
    // three rounds, merged successively
    val s0 = Profiling.coverageState(
      corpus.filter(col("doc_id") < 3000), "text", "domain")
    val s1 = Profiling.coverageIncremental(
      corpus.filter(col("doc_id") >= 3000 && col("doc_id") < 7000),
      "text", "domain", s0)
    val s2 = Profiling.coverageIncremental(
      corpus.filter(col("doc_id") >= 7000), "text", "domain", s1)
    val rolled = Profiling.coverageReport(s2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rolled == oneShot)
  }

  test("coverage sketch: exact n_docs, estimate within 5%, merge is exact") {
    val exact = corpus.groupBy("domain").agg(
      count(lit(1)).as("n"), countDistinct("text").as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val oneShot = Profiling.coverageSketchReport(
      Profiling.coverageSketch(corpus, "text", "domain"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(oneShot.keySet == exact.keySet)
    oneShot.foreach { case (dom, (n, dEst)) =>
      val (en, ed) = exact(dom)
      assert(n == en, s"$dom fetch count must be exact")
      assert(math.abs(dEst - ed) <= math.max(1L, ed / 20),
        s"$dom est $dEst vs exact $ed exceeds 5%")
    }
    // merging per-round sketches reproduces the one-shot sketch estimates
    // EXACTLY (HLL union determinism) — the property that lets a crawl
    // keep O(domains) state forever
    val m = Profiling.coverageSketchMerge(
      Profiling.coverageSketch(
        corpus.filter(col("doc_id") < 5000), "text", "domain"),
      Profiling.coverageSketch(
        corpus.filter(col("doc_id") >= 5000), "text", "domain"))
    val merged = Profiling.coverageSketchReport(m)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(merged == oneShot)
  }

  test("totality: null text dropped, null domain keyed <null>") {
    val docs = Seq(
      (1L, "a", "d1"), (2L, null, "d1"), (3L, "b", null), (4L, "b", null))
      .toDF("doc_id", "text", "domain")
    val got = Profiling.coverage(docs, "text", "domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(("d1", 1L, 1L, 0L), ("<null>", 2L, 1L, 5000L)))
    // sketch path: same totality rules
    val sk = Profiling.coverageSketchReport(
      Profiling.coverageSketch(docs, "text", "domain"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sk == Set(("d1", 1L), ("<null>", 2L)))
  }
}
