package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipelines
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Training-data prep operators: concat-and-chunk sequence packing, hash-based
  * mixture sampling, PII scrubbing. The DuckDB oracle proves engine parity;
  * these tests pin the semantic invariants on crafted inputs.
  */
class PipelinesSpec extends SparkSpec {

  test("packSequences: offsets stay under maxTokens and shard streams are gapless") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, Seq.fill(7 + (i % 5).toInt)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = Pipelines.packSequences(docs, "doc_id", "text", maxTokens = 16, shards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.length == 40)
    packed.foreach { case (id, shard, n, pack, off) =>
      assert(shard == (id % 4).toInt)
      assert(off >= 0 && off < 16, s"doc $id: offset $off out of range")
      assert(pack >= 0)
    }
    // within a shard, each doc starts exactly where the previous one ended:
    // global token position = pack_id * maxTokens + offset
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.zip(sorted.tail).foreach { case ((_, _, n1, p1, o1), (id2, _, _, p2, o2)) =>
        val endOfPrev = p1 * 16 + o1 + n1
        assert(p2 * 16 + o2 == endOfPrev,
          s"doc $id2 does not start at the previous doc's end ($endOfPrev)")
      }
    }
    // docs longer than the remaining pack space must straddle the boundary,
    // i.e. some doc has offset + n_tokens > maxTokens
    assert(packed.exists { case (_, _, n, _, off) => off + n > 16 },
      "fixture must exercise boundary straddling")
  }

  test("hashSample: rate 1 keeps all, rate 0 keeps none, sampling is deterministic") {
    val docs = Tables(spark, sfDir, "documents")
    val total = docs.count()
    val all = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 1.0)
    assert(all.count() == total)
    val none = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.0)
    assert(none.count() == 0)
    val half1 = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    val half2 = Pipelines.hashSample(docs, "doc_id", "source", Map.empty, defaultRate = 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(half1 == half2, "hash sampling must be exactly reproducible")
    // md5 is uniform: expect ~half within a loose tolerance on a small corpus
    assert(math.abs(half1.length - total / 2.0) < total * 0.25,
      s"kept ${half1.length} of $total at rate 0.5")
  }

  test("hashSample: per-source rates apply to the right sources") {
    val docs = Tables(spark, sfDir, "documents")
    val kept = Pipelines.hashSample(docs, "doc_id", "source",
      rates = Map("src0" -> 1.0, "src1" -> 0.0), defaultRate = 0.0)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(bySrc.getOrElse("src0", 0L) == src0Total, "rate 1.0 must keep every src0 doc")
    assert(!bySrc.contains("src1"), "rate 0.0 must drop every src1 doc")
    assert(bySrc.keySet.subsetOf(Set("src0")), "defaultRate 0.0 must drop other sources")
  }

  test("scrubPii replaces emails, IPs, and phones with typed placeholders") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "server at 10.0.255.3 responded"),
      (3L, "call +1 (415) 555-0199 today"),
      (4L, "clean text with no pii at all"),
      (5L, "two hits: a@b.io and 1.2.3.4")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(got(1L) == (("mail [EMAIL] now", 1, 0, 0)))
    assert(got(2L) == (("server at [IP] responded", 0, 1, 0)))
    assert(got(3L)._1 == "call [PHONE] today")
    assert(got(3L)._4 == 1)
    assert(got(4L) == (("clean text with no pii at all", 0, 0, 0)))
    assert(got(5L) == (("two hits: [EMAIL] and [IP]", 1, 1, 0)))
  }
}
