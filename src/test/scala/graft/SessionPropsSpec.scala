package graft

import org.apache.spark.sql.functions._

import graft.plans.SessionProps
import graft.sources.Tables

/** Session properties (X1) + byte-budget sampling (S8) + winnowing sketch. */
class SessionPropsSpec extends SparkSpec {

  test("graft.limit caps rows at the scan") {
    spark.conf.set(SessionProps.LimitKey, "100")
    try assert(Tables(spark, sfDir, "lineitem").count() == 100)
    finally spark.conf.unset(SessionProps.LimitKey)
  }

  test("graft.sampling_value samples a row fraction") {
    spark.conf.set(SessionProps.SamplingKey, "0.1")
    try {
      val full = 6005L // sf0.001 lineitem
      val n = Tables(spark, sfDir, "lineitem").count()
      assert(n > full / 50 && n < full / 3, s"sample of ~10% expected, got $n")
    } finally spark.conf.unset(SessionProps.SamplingKey)
  }

  test("graft.sampling_bytes converts a byte budget to a row fraction (S8)") {
    val table = Tables(spark, sfDir, "lineitem")
    val full = table.count()
    // budget = ~half the file's bytes → roughly half the rows
    val bytes = new org.apache.hadoop.fs.Path(s"$sfDir/lineitem.parquet")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(new org.apache.hadoop.fs.Path(s"$sfDir/lineitem.parquet")).getLength
    spark.conf.set(SessionProps.SamplingBytesKey, (bytes / 2).toString)
    try {
      val n = Tables(spark, sfDir, "lineitem").count()
      assert(n > full / 4 && n < full * 3 / 4, s"~50% expected, got $n of $full")
    } finally spark.conf.unset(SessionProps.SamplingBytesKey)
    // budget larger than the table → no sampling at all
    spark.conf.set(SessionProps.SamplingBytesKey, (bytes * 10).toString)
    try assert(Tables(spark, sfDir, "lineitem").count() == full)
    finally spark.conf.unset(SessionProps.SamplingBytesKey)
  }

  test("winnowing sketches: identical docs identical, shared content overlaps") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .orderBy("doc_id").limit(2).collect()
    val t0 = base(0).getString(1); val t1 = base(1).getString(1)
    val docs = Seq(
      (1L, t0), (2L, t0),                    // identical
      (3L, t0 + " extra tail words here"),   // near-identical
      (4L, t1)                               // unrelated
    ).toDF("doc_id", "text")
    val sk = graft.operators.TextAnalysis.winnowingSketch(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sk(1L) == sk(2L), "identical docs must have identical sketches")
    val overlap = sk(1L).intersect(sk(3L)).size.toDouble / sk(1L).size
    assert(overlap > 0.8, s"near-identical doc overlap too low: $overlap")
    val cross = sk(1L).intersect(sk(4L)).size.toDouble / sk(1L).size
    assert(cross < overlap, "unrelated doc must overlap less than near-dup")
  }
}
