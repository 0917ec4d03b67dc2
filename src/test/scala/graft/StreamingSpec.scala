package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Genuine Structured Streaming run (SURVEY.md §2.9, ST4/ST5): readStream over the
  * events fixture → watermarked tumbling aggregation → checkpointed sink, then the
  * streamed result is compared against the identical batch plan. Also asserts the
  * watermark actually drops late rows.
  */
class StreamingSpec extends SparkSpec {

  test("readStream → watermark → checkpointed sink matches batch result") {
    val batchEvents = Tables(spark, sfDir, "events")
    val schema = batchEvents.schema

    // stage the fixture as a one-file stream source dir (µs-truncated ts so the
    // stream schema matches what Tables produces)
    val srcDir = Files.createTempDirectory("graft-stream-src").toFile
    val ckDir = Files.createTempDirectory("graft-stream-ck").toFile
    val outDir = Files.createTempDirectory("graft-stream-out").toFile
    batchEvents.coalesce(1).write.mode("overwrite").parquet(srcDir.getAbsolutePath)

    val stream = EventStreams.readEventStream(spark, srcDir.getAbsolutePath, schema)
    assert(stream.isStreaming, "readStream must produce a streaming DataFrame")

    val q = EventStreams.streamingTumbling(stream, "1 hour", watermark = "2 hours")
      .writeStream
      .format("parquet")
      .option("path", outDir.getAbsolutePath)
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode only emits windows the watermark has passed; with AvailableNow
    // the final watermark sits 2h behind max(ts), so compare on closed windows only
    val streamed = spark.read.parquet(outDir.getAbsolutePath)
      .groupBy("window_start", "event_type").agg(sum("n").as("n"))
    val maxTs = batchEvents.agg(max("ts")).collect().head.getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 2 * 3600 * 1000)
    val batch = EventStreams.tumbling(batchEvents, "1 hour")
      .filter(col("window_start") < lit(horizon) - expr("INTERVAL 1 HOUR"))
      .select("window_start", "event_type", "n")

    val s = streamed.filter(col("window_start") < lit(horizon) - expr("INTERVAL 1 HOUR"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(s == b, s"streamed windows diverge from batch: missing=${b.diff(s).take(3)} extra=${s.diff(b).take(3)}")
    assert(s.nonEmpty, "expected at least one closed window")
  }

  test("streaming dedup drops duplicate ids across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStreams.streamingDedup(
        input.toDF().toDF("event_id", "ts"), "event_id", "ts", "1 hour")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()

    input.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // duplicate id 1 in a later batch (within watermark) must be dropped
    input.addData((1L, t("2024-01-01 10:05:00")), (3L, t("2024-01-01 10:06:00")))
    q.processAllAvailable()

    val ids = spark.sql("SELECT event_id FROM stream_dedup").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(1L, 2L, 3L), s"dedup state failed: ${ids.toSeq}")
    q.stop()
  }

  test("stream-static anti-join: incoming docs deduped against a static fingerprint history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the streaming form of Dedup.exactIncremental: the history is a static
    // frame (at scale: the persisted fingerprint table), each micro-batch
    // anti-joins against it — no streaming state needed for history dedup
    val history = graft.operators.TextAnalysis.fingerprint(
      Seq((1L, "seen before")).toDF("doc_id", "text"), "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val incoming = input.toDF().toDF("doc_id", "text")
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .join(history.select("fp"), Seq("fp"), "left_anti")
    val q = incoming.writeStream.format("memory").queryName("stream_incr")
      .outputMode("append").start()

    input.addData((10L, "SEEN   before"), (11L, "fresh one"))
    q.processAllAvailable()
    input.addData((12L, "another fresh"), (13L, "seen before"))
    q.processAllAvailable()

    val ids = spark.sql("SELECT doc_id FROM stream_incr").collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == Seq(11L, 12L),
      s"history dups must be dropped in every micro-batch: ${ids.toSeq}")
    q.stop()
  }

  test("streaming bloom dedup: foreachBatch vs fp state + bloom sidecar == batch exact") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the rolling form exactIncrementalBloom exists for: every micro-batch
    // dedups against the persisted state through the sidecar, then appends
    // its fingerprints to BOTH (the same-commit-step sidecar contract)
    val batches = Seq(
      Seq((1L, "alpha beta"), (2L, "unique two"), (3L, "gamma delta")),
      Seq((4L, "ALPHA   beta"), (5L, "unique five")),
      Seq((6L, "gamma delta"), (7L, "unique seven"), (8L, "unique five")))
    val path = "target/bloomspec_stream"
    var state = graft.operators.TextAnalysis.fingerprint(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    graft.operators.BloomState.write(state, "fp", path, expectedItems = 100L)
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= graft.operators.Dedup.exactIncrementalBloom(
          batch, "doc_id", "text", state, path).collect().map(_.getLong(0))
        val fps = graft.operators.TextAnalysis.fingerprint(
          batch, "doc_id", "text")
        graft.operators.BloomState.append(spark, path, fps, "fp")
        state = state.unionByName(fps).localCheckpoint()
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val batchResult = graft.operators.Dedup.exact(
      batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == kept.toSet.size, "a doc must be emitted at most once")
    assert(kept.toSet == batchResult,
      s"stream ${kept.sorted} != batch ${batchResult.toSeq.sorted}")
    assert(kept.toSet == Set(1L, 2L, 3L, 5L, 7L))
  }

  test("streaming near-dedup: foreachBatch vs persisted LSH state == batch dedupNear") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // near-dup groups are CLIQUES (identical copies), where incremental
    // direct-edge matching and batch CC clustering agree exactly — the
    // equivalence nearIncremental's scaladoc pins
    val dupA = "the quick brown fox jumps over the lazy dog in the misty morning light"
    val dupB = "distributed query engines shuffle partitioned data across many executor nodes"
    def uniq(i: Long) = s"unique doc $i with tokens u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"
    val batches = Seq(
      Seq((1L, dupA), (2L, uniq(2)), (3L, dupB)),
      Seq((4L, dupA), (5L, uniq(5))),               // 4 dups history doc 1
      Seq((6L, dupB), (7L, dupA), (8L, uniq(8))))   // 6, 7 dup history docs 3, 1

    val input = MemoryStream[(Long, String)]
    // persisted state starts empty; each micro-batch near-dedups against it,
    // emits survivors, then appends its own LSH state — the foreachBatch
    // transaction a continuously-ingesting pipeline runs
    var state = graft.operators.Dedup.minHashState(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val survivors = graft.operators.Dedup.nearIncremental(
          batch, "doc_id", "text", state)
        kept ++= survivors.collect().map(_.getLong(0))
        state = state.unionByName(
          graft.operators.Dedup.minHashState(batch, "doc_id", "text"))
          .localCheckpoint() // state table stays a plan LEAF across batches
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val batchResult = graft.operators.Pipelines.dedupNear(
      batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == kept.toSet.size, "a doc must be emitted at most once")
    assert(kept.toSet == batchResult,
      s"stream ${kept.sorted} != batch ${batchResult.toSeq.sorted}")
    assert(kept.toSet == Set(1L, 2L, 3L, 5L, 8L))
  }

  test("streaming image dedup: foreachBatch vs persisted hamming state == batch hammingClusters") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // fingerprint dup groups are cliques (identical or 1-bit-flip copies of
    // one image), where direct-edge history matching and batch CC clustering
    // agree exactly — the hammingIncremental scaladoc equivalence
    val k = 2
    val hA = 0x0123456789abcdefL; val hB = 0x76543210fedcba98L
    val u2 = 0x00ff00ff00ff00ffL; val u5 = 0x0f0f0f0f0f0f0f0fL
    val u8 = 0x3333cccc3333ccccL
    val batches = Seq(
      Seq((1L, hA), (2L, u2), (3L, hB)),
      Seq((4L, hA ^ 1L), (5L, u5)),                 // 4 is 1 bit off history doc 1
      Seq((6L, hB), (7L, hA), (8L, u8)))            // 6, 7 dup history docs 3, 1

    val input = MemoryStream[(Long, Long)]
    var state = graft.operators.Dedup.hammingState(
      Seq.empty[(Long, Long)].toDF("doc_id", "phash"), "doc_id", "phash", k)
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("doc_id", "phash").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val survivors = graft.operators.Dedup.hammingIncremental(
          batch, "doc_id", "phash", state, k)
        kept ++= survivors.collect().map(_.getLong(0))
        state = state.unionByName(
          graft.operators.Dedup.hammingState(batch, "doc_id", "phash", k))
          .localCheckpoint() // state table stays a plan LEAF across batches
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val batchResult = graft.operators.Dedup.hammingClusters(
      batches.flatten.toDF("doc_id", "phash"), "doc_id", "phash", k)
      .filter(col("doc_id") === col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == kept.toSet.size, "a doc must be emitted at most once")
    assert(kept.toSet == batchResult,
      s"stream ${kept.sorted} != batch ${batchResult.toSeq.sorted}")
    assert(kept.toSet == Set(1L, 2L, 3L, 5L, 8L))
  }

  test("streaming crawl dedup: foreachBatch vs persisted url state == batch urlDedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // URL identity groups are exact keys, so direct history matching and
    // batch min-per-key agree for ANY batch slicing — the exactIncremental
    // equivalence, on the canonical URL
    val batches = Seq(
      Seq((1L, "https://a.com/x?utm_source=f"), (2L, "http://b.org:80/y")),
      Seq((3L, "HTTPS://A.COM:443/x"),          // dup of 1 under canonicalization
        (4L, "https://c.net/z?b=2&a=1")),
      Seq((5L, "https://c.net/z?a=1&b=2"),      // dup of 4
        (6L, "http://b.org/y#top"),             // dup of 2
        (7L, "https://d.io/w")))

    val input = MemoryStream[(Long, String)]
    var state = graft.operators.Urls.urlState(
      Seq.empty[(Long, String)].toDF("doc_id", "url"), "doc_id", "url")
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("doc_id", "url").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val survivors = graft.operators.Urls.urlDedupIncremental(
          batch, "doc_id", "url", state)
        kept ++= survivors.collect().map(_.getLong(0))
        state = state.unionByName(
          graft.operators.Urls.urlState(batch, "doc_id", "url"))
          .localCheckpoint()
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val batchResult = graft.operators.Urls.urlDedup(
      batches.flatten.toDF("doc_id", "url"), "doc_id", "url")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == kept.toSet.size, "a url must be emitted at most once")
    assert(kept.toSet == batchResult,
      s"stream ${kept.sorted} != batch ${batchResult.toSeq.sorted}")
    assert(kept.toSet == Set(1L, 2L, 4L, 7L))
  }

  test("streaming States lifecycle: disk-persisted fp state across micro-batches, mid-stream retraction + compaction") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{Dedup, States, TextAnalysis}

    // the q_pipeline_e2e_incremental2 lifecycle driven by a STREAM: the
    // state lives on disk (States), each micro-batch reads the live view,
    // emits survivors, appends its fingerprints; between batches 2 and 3 a
    // takedown retracts batch-1 content and the state compacts — batch 3's
    // re-serve of that content must re-admit
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_state")
      .toString + "/fp"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    States.write(TextAnalysis.fingerprint(empty, "doc_id", "text"), dir)
    val batches = Seq(
      Seq((1L, "alpha beta"), (2L, "gamma delta")),
      Seq((3L, "alpha beta"), (4L, "epsilon zeta")),   // 3 dups 1 → dropped
      Seq((5L, "alpha beta"), (6L, "gamma delta"),     // 5 re-admits (1 retracted)
        (7L, "eta theta")))                            // 6 still dups 2 → dropped

    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // survivors MATERIALIZE before the append (the read-before-append
        // contract: append's refreshByPath would invalidate the cached
        // plan and recompute the batch against its own additions)
        val survivors = Dedup.exactIncremental(
          batch, "doc_id", "text", States.read(spark, dir))
          .collect().map(_.getLong(0))
        kept ++= survivors
        States.append(TextAnalysis.fingerprint(batch, "doc_id", "text"), dir)
        if (id == 1L) { // takedown between micro-batches 2 and 3
          States.retract(TextAnalysis.fingerprint(
            Seq((1L, "alpha beta")).toDF("doc_id", "text"),
            "doc_id", "text").select("fp"), dir)
          States.compact(spark, dir)
        }
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    assert(kept.toSeq.sorted == Seq(1L, 2L, 4L, 5L, 7L),
      s"lifecycle stream kept ${kept.toSeq}")
    // the final on-disk state equals a rebuild on what it should claim:
    // everything ingested minus the retracted content (content-keyed)
    val claimed = States.read(spark, dir).select("fp").distinct()
      .collect().map(_.getString(0)).toSet
    val expect = TextAnalysis.fingerprint(
      batches.flatten.toDF("doc_id", "text"), "doc_id", "text")
      .select("fp").distinct().collect().map(_.getString(0)).toSet
    // 'alpha beta' was retracted but batch 3 re-ingested it → still claimed
    assert(claimed == expect, "state after the full stream must claim all live content")
  }

  test("streaming semantic dedup: foreachBatch vs persisted cell state == batch semanticDedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // exact-clone groups are cliques in ANY cell structure (identical vectors
    // share a cell under every frozen seed set), so the incremental form and
    // the batch form agree exactly — the same equivalence class the
    // near-dedup streaming test pins
    val base = graft.sources.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 30)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val byId = base.toMap
    val batches = Seq(
      base.filter(_._1 < 10),
      base.filter(t => t._1 >= 10 && t._1 < 20) :+ (103L, byId(3L)),
      (base.filter(t => t._1 >= 20) :+ (115L, byId(15L))) :+ (121L, byId(21L)))

    val input = MemoryStream[(Long, Seq[Float])]
    var state: org.apache.spark.sql.DataFrame = null
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (state == null) {
          // first batch bootstraps: full semanticDedup + frozen-seed state
          val survivors = graft.operators.Semantic.semanticDedup(
            batch, "vec_id", "embedding", k = 4, threshold = 0.9)
          kept ++= survivors.collect().map(_.getLong(0))
          state = graft.operators.Semantic.semanticState(
            batch, "vec_id", "embedding", k = 4).localCheckpoint()
        } else {
          val survivors = graft.operators.Semantic.semanticIncremental(
            batch, "vec_id", "embedding", state, threshold = 0.9)
          val ids = survivors.collect().map(_.getLong(0))
          kept ++= ids
          // append survivors' rows under the FROZEN cells (assignment against
          // the state seeds), keeping is_seed false for new rows
          val newRows = batch.join(survivors.select("vec_id"), "vec_id")
            .select(col("vec_id"), col("embedding").as("v"))
            .join(survivors, "vec_id")
            .select(col("vec_id"), col("cell"), col("v"), lit(false).as("is_seed"))
          state = state.unionByName(newRows).localCheckpoint()
        }
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val batchResult = graft.operators.Semantic.semanticDedup(
      (base ++ Seq((103L, byId(3L)), (115L, byId(15L)), (121L, byId(21L))))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 4, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == kept.toSet.size, "a vector must be emitted at most once")
    assert(kept.toSet == batchResult,
      s"stream ${kept.sorted} != batch ${batchResult.toSeq.sorted}")
    assert(kept.toSet == (0L until 30L).toSet, "exactly the clones must drop")
  }

  test("streaming ANN ingest: foreachBatch ivfPqAppend == one-shot append, any batch slicing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // codes and cells depend ONLY on the codebooks frozen by the first
    // write, so the index CONTENT must be invariant to how the later rows
    // are sliced into micro-batches — the streaming form of the frozen-seed
    // contract
    val base = graft.sources.Tables(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 60 && col("embedding").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val batches = Seq(
      base.filter(_._1 < 20),
      base.filter(t => t._1 >= 20 && t._1 < 35),
      base.filter(_._1 >= 35))
    val dirStream = java.nio.file.Files.createTempDirectory("ivfpq_st").toString + "/idx"
    val dirRef = java.nio.file.Files.createTempDirectory("ivfpq_st").toString + "/ref"

    val input = MemoryStream[(Long, Seq[Float])]
    var booted = false
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!booted) {
          graft.operators.Similarity.ivfPqWrite(
            batch, "vec_id", "embedding", dirStream, nlist = 4, m = 8, ksub = 8)
          booted = true
        } else graft.operators.Similarity.ivfPqAppend(
          spark, batch, "vec_id", "embedding", dirStream)
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    graft.operators.Similarity.ivfPqWrite(
      batches.head.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dirRef, nlist = 4, m = 8, ksub = 8)
    graft.operators.Similarity.ivfPqAppend(spark,
      (batches(1) ++ batches(2)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dirRef)
    def rows(d: String) = spark.read.parquet(d)
      // the partition column's type is re-inferred from directory names on
      // read (int here) — normalize for the comparison
      .select(col("vec_id"), col("codes").cast("string"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(dirStream) == rows(dirRef),
      "index content must be invariant to micro-batch slicing")
    assert(rows(dirStream).map(_._1) == base.map(_._1).toSet)
  }

  test("streaming BM25 index ingest: foreachBatch append == one-shot build, any batch slicing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // postings are per-doc and df is recomputed at probe time, so the grown
    // index must probe identically however the corpus was sliced into
    // micro-batches — the lexical form of the slicing-invariance contract
    val base = graft.sources.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 60)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val batches = Seq(
      base.filter(_._1 < 20),
      base.filter(t => t._1 >= 20 && t._1 < 35),
      base.filter(_._1 >= 35))
    val dirStream = java.nio.file.Files.createTempDirectory("bm25_st").toString + "/idx"

    val input = MemoryStream[(Long, String)]
    var booted = false
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!booted) {
          graft.operators.TextAnalysis.bm25IndexWrite(
            batch, "doc_id", "text", dirStream)
          booted = true
        } else graft.operators.TextAnalysis.bm25IndexAppend(
          batch, "doc_id", "text", dirStream)
        ()
      }
      .start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val direct = graft.operators.TextAnalysis.bm25Score(
      base.toDF("doc_id", "text"), "doc_id", "text", "data join slow")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probed = graft.operators.TextAnalysis.bm25Probe(
      spark, dirStream, "data join slow")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probed == direct,
      "stream-grown index must probe identically to the in-plan scorer")
  }

  test("streaming mixture gates: foreachBatch vs persisted histogram/spend state == sequential batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Pipelines

    def mk(i: Long) = (i, if (i % 3 == 0) "web" else "books",
      (i * 37 % 100).toDouble)
    val batches = Seq(0L until 40L, 40L until 80L, 80L until 120L)
      .map(_.map(mk))
    def emptyState = Pipelines.quantileState(
      Seq.empty[(Long, String, Double)].toDF("doc_id", "domain", "sc"),
      "doc_id", "sc", "domain", lo = 0.0, hi = 100.0, bins = 16)

    // --- rolling quantile gate through a real stream ---
    val input = MemoryStream[(Long, String, Double)]
    var qState = emptyState
    val streamKept = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    val q = input.toDF().toDF("doc_id", "domain", "sc").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val kept = Pipelines.quantileIncremental(batch, "doc_id", "sc",
          "domain", qState, q = 0.5, lo = 0.0, hi = 100.0, bins = 16)
        streamKept += kept.collect().map(_.getLong(0)).toSeq.sorted
        qState = qState.unionByName(
          Pipelines.quantileState(batch, "doc_id", "sc", "domain", 0.0, 100.0, 16))
          .groupBy("domain", "bucket").agg(sum("n").as("n"))
          .localCheckpoint() // state table stays a plan LEAF across batches
        ()
      }.start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // sequential replay of the same slices must match slice for slice
    var refState = emptyState
    val refKept = batches.map { b =>
      val df = b.toDF("doc_id", "domain", "sc")
      val kept = Pipelines.quantileIncremental(df, "doc_id", "sc", "domain",
        refState, q = 0.5, lo = 0.0, hi = 100.0, bins = 16)
        .collect().map(_.getLong(0)).toSeq.sorted
      refState = refState.unionByName(
        Pipelines.quantileState(df, "doc_id", "sc", "domain", 0.0, 100.0, 16))
        .groupBy("domain", "bucket").agg(sum("n").as("n"))
      kept
    }
    assert(streamKept.toSeq == refKept, "stream slices must equal batch replay")
    assert(streamKept.flatten.nonEmpty && streamKept.flatten.size < 120,
      "the gate must keep some and drop some")
    // STATE ADDITIVITY: the rolled-forward histogram == the one-shot one
    val oneShot = Pipelines.quantileState(
      batches.flatten.toDF("doc_id", "domain", "sc"),
      "doc_id", "sc", "domain", 0.0, 100.0, 16)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val rolled = refState
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(rolled == oneShot, "histogram state must be slicing-invariant")

    // --- rolling token budget over the same slicing ---
    def mkDoc(i: Long) = (i, if (i % 3 == 0) "web" else "books",
      (0 to (i % 5).toInt).map(j => s"t${i}x$j").mkString(" "))
    val docBatches = Seq(0L until 40L, 40L until 80L, 80L until 120L)
      .map(_.map(mkDoc))
    val budgets = Map("web" -> 30L, "books" -> 45L)
    var spent = Seq.empty[(String, Long)].toDF("domain", "spent_tok")
    val tbKept = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    docBatches.foreach { b =>
      val df = b.toDF("doc_id", "domain", "text")
      val kept = Pipelines.tokenBudgetIncremental(df, "doc_id", "text",
        "domain", spent, budgets, defaultBudget = 10L)
      tbKept += kept.collect().map(_.getLong(0)).toSeq.sorted
      spent = spent.unionByName(
        Pipelines.tokenBudgetState(
          df.join(kept.select("doc_id"), "doc_id"), "doc_id", "text", "domain"))
        .groupBy("domain").agg(sum("spent_tok").as("spent_tok"))
        .localCheckpoint()
    }
    val allKeptIds = tbKept.flatten.toSet
    assert(allKeptIds.nonEmpty && allKeptIds.size < 120,
      "the budget must bite across batches")
    // final spend state == one-shot re-tokenization of every kept doc
    val allDocs = docBatches.flatten.toDF("doc_id", "domain", "text")
    val oneShotSpend = Pipelines.tokenBudgetState(
      allDocs.filter(col("doc_id").isin(allKeptIds.toSeq: _*)),
      "doc_id", "text", "domain")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rolledSpend = spent
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rolledSpend == oneShotSpend, "spend state must be slicing-invariant")
    // once a domain's budget is exhausted, later batches add nothing to it
    for ((dom, b) <- budgets) {
      val spentDom = rolledSpend.find(_._1 == dom).map(_._2).getOrElse(0L)
      assert(spentDom >= b,
        s"fixture must exhaust $dom (spent $spentDom < budget $b)")
    }
    assert(tbKept.last.isEmpty || tbKept.last.size < docBatches.last.size,
      "an exhausted budget must reject most of the last batch")
  }

  test("semanticIncremental refuses an empty (seedless) state instead of dropping the batch") {
    val emb = graft.sources.Tables(spark, sfDir, "embeddings").limit(20)
    val emptyState = graft.operators.Semantic.semanticState(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", k = 4)
    // the guard is lazy (it rides the batch job instead of costing an eager
    // isEmpty job per micro-batch), so the failure surfaces at action time,
    // wrapped in Spark's task-failure chain
    val e = intercept[Exception] {
      graft.operators.Semantic.semanticIncremental(
        emb, "vec_id", "embedding", emptyState, threshold = 0.9).collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("bootstrap"), s"unexpected failure chain:\n$messages")
  }

  test("stream-stream join matches events to orders within the time bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("user", "cts").withWatermark("cts", "1 hour")
    val b = buys.toDF().toDF("buyer", "bts").withWatermark("bts", "1 hour")

    val joined = c.join(b,
      expr("user = buyer AND bts BETWEEN cts AND cts + INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()

    clicks.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
    buys.addData((1L, t("2024-01-01 10:10:00")), // within 30 min → match
      (2L, t("2024-01-01 11:30:00")))            // outside bound → no match
    q.processAllAvailable()
    // advance both watermarks so results finalize
    clicks.addData((99L, t("2024-01-01 23:00:00")))
    buys.addData((98L, t("2024-01-01 23:00:00")))
    q.processAllAvailable()

    val rows = spark.sql("SELECT user FROM ss_join").collect().map(_.getLong(0))
    assert(rows.toSeq == Seq(1L), s"expected only user 1 matched: ${rows.toSeq}")
    q.stop()
  }

  test("session windows run in streaming mode with watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")

    val q = df.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count("*").as("n"))
      .select(col("user_id"), col("w.start").as("s"), col("w.end").as("e"), col("n"))
      .writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()

    // user 1: two events 10 min apart (one session), then a 2h gap (new session)
    input.addData((t("2024-01-01 10:00:00"), 1L, 1.0), (t("2024-01-01 10:10:00"), 1L, 1.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 12:30:00"), 1L, 1.0), (t("2024-01-01 15:00:00"), 9L, 1.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 23:00:00"), 9L, 1.0)) // push watermark far ahead
    q.processAllAvailable()

    val rows = spark.sql("SELECT user_id, s, e, n FROM stream_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
    val u1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.length == 2, s"expected two closed sessions for user 1: ${rows.toSeq}")
    assert(u1(0)._2.startsWith("2024-01-01 10:00") && u1(0)._3.startsWith("2024-01-01 10:40"),
      s"first session must merge both events and end 30min after the last: ${u1.toSeq}")
    assert(u1(0)._4 == 2)
    assert(u1(1)._2.startsWith("2024-01-01 12:30") && u1(1)._4 == 1)
    q.stop()
  }

  test("mapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Double)]
    val df = input.toDF().toDF("user_id", "value")
    val q = EventStreams.statefulUserTotals(df)
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()

    input.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
    q.processAllAvailable()
    input.addData((1L, 2.5)) // second batch: state must carry over
    q.processAllAvailable()

    val rows = spark.sql(
      "SELECT userId, max(n) AS n, max(sumValue) AS s FROM user_totals GROUP BY userId")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows(1L) == ((3L, 17.5)), s"state did not accumulate: $rows")
    assert(rows(2L) == ((1L, 1.0)))
    q.stop()
  }

  test("watermark drops late data in update mode") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val agg = df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count("*").as("n"))

    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode("update").start()

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 11:00:00"), "a"))
    q.processAllAvailable() // watermark advances to 10:50
    input.addData((t("2024-01-01 10:01:00"), "a")) // > 10 min late → dropped
    q.processAllAvailable()
    input.addData((t("2024-01-01 11:01:00"), "a")) // on time → counted
    q.processAllAvailable()

    val rows = spark.sql("SELECT w.start, event_type, n FROM late_test").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    // the 10:00 window must never reach n=2 (late row dropped)
    val w10 = rows.filter(_._1.startsWith("2024-01-01 10:00")).map(_._2)
    assert(w10.nonEmpty && w10.max == 1, s"late row leaked into closed window: ${rows.toSeq}")
    val w11 = rows.filter(_._1.startsWith("2024-01-01 11:00")).map(_._2)
    assert(w11.max == 2, s"on-time row missing: ${rows.toSeq}")
    q.stop()
  }

  test("funnel: strictly-ordered greedy completion; partial funnels drop") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: clean completion
      (1L, 1L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click", 1.0),
      (3L, 1L, ts("2024-01-01 10:02:00"), "purchase", 1.0),
      // user 2: click BEFORE the first view -> no click after view -> drop
      (4L, 2L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (5L, 2L, ts("2024-01-01 10:01:00"), "view", 1.0),
      (6L, 2L, ts("2024-01-01 10:02:00"), "purchase", 1.0),
      // user 3: no purchase -> drop
      (7L, 3L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (8L, 3L, ts("2024-01-01 10:01:00"), "click", 1.0),
      // user 4: purchase before click is skipped; later purchase counts
      (9L, 4L, ts("2024-01-01 10:00:00"), "view", 1.0),
      (10L, 4L, ts("2024-01-01 10:01:00"), "purchase", 1.0),
      (11L, 4L, ts("2024-01-01 10:02:00"), "click", 1.0),
      (12L, 4L, ts("2024-01-01 10:03:00"), "purchase", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventStreams.funnel(ev, Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3))))
      .toMap
    assert(got.keySet == Set(1L, 4L), s"got $got")
    assert(got(1L) == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:01:00"), ts("2024-01-01 10:02:00"))))
    assert(got(4L) == ((ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"), ts("2024-01-01 10:03:00"))))
  }

  test("ohlcBars: open/close by time order within the bar; extremes exact") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:05:00"), "s", 3.0),
      (2L, 1L, ts("2024-01-01 10:10:00"), "s", 9.0),
      (3L, 1L, ts("2024-01-01 10:20:00"), "s", 2.0),
      (4L, 1L, ts("2024-01-01 10:50:00"), "s", 7.0),
      (5L, 1L, ts("2024-01-01 11:05:00"), "s", 4.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = EventStreams.ohlcBars(ev, "1 hour").collect()
      .map(r => r.getTimestamp(0).toString ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .toMap
    assert(got("2024-01-01 10:00:00.0") == ((3.0, 9.0, 2.0, 7.0, 4L)), s"got $got")
    assert(got("2024-01-01 11:00:00.0") == ((4.0, 4.0, 4.0, 4.0, 1L)))
  }

  test("streaming CDC upsert sink: per-batch MERGE into a catalog table (r13)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_cd", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cd.dir", dir)
    spark.sql("CREATE TABLE graft_cd.main.state AS " +
      "SELECT CAST(1 AS BIGINT) AS k, 'one' AS v UNION ALL SELECT 2, 'two'")

    // changes: (key, value, op, seq) — op 'U' upserts, 'D' deletes
    val input = MemoryStream[(Long, String, String, Long)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "v", "op", "seq"),
      "graft_cd.main.state", Seq("k"), "op", "seq",
      java.nio.file.Files.createTempDirectory("graft-cdc-ck").toString)

    def state(): Map[Long, String] =
      spark.sql("SELECT k, v FROM graft_cd.main.state").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

    // batch 1: update k=1, insert k=3, and a within-batch duplicate for
    // k=3 where the NEWER seq must win (CDC compaction)
    input.addData((1L, "uno", "U", 10L), (3L, "stale", "U", 11L), (3L, "three", "U", 12L))
    q.processAllAvailable()
    assert(state() == Map(1L -> "uno", 2L -> "two", 3L -> "three"))

    // batch 2: delete k=2, upsert k=4; a delete for an absent key is a no-op
    input.addData((2L, "", "D", 20L), (4L, "four", "U", 21L), (9L, "", "D", 22L))
    q.processAllAvailable()
    assert(state() == Map(1L -> "uno", 3L -> "three", 4L -> "four"))
    q.stop()
  }

  test("CDC upsert sink guardSeq: late batch with older seq cannot overwrite (r14)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-g").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_cg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cg.dir", dir)
    // guarded target persists the seq column
    spark.sql("CREATE TABLE graft_cg.main.state AS " +
      "SELECT CAST(1 AS BIGINT) AS k, 'one' AS v, CAST(1 AS BIGINT) AS seq " +
      "UNION ALL SELECT 2, 'two', 2")

    val input = MemoryStream[(Long, String, String, Long)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "v", "op", "seq"),
      "graft_cg.main.state", Seq("k"), "op", "seq",
      java.nio.file.Files.createTempDirectory("graft-cdc-gck").toString,
      guardSeq = true)

    def state(): Map[Long, (String, Long)] =
      spark.sql("SELECT k, v, seq FROM graft_cg.main.state").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

    // batch 1 (fresh): update k=1 to seq 10, insert k=3 at seq 12
    input.addData((1L, "uno", "U", 10L), (3L, "three", "U", 12L))
    q.processAllAvailable()
    assert(state() == Map(1L -> (("uno", 10L)), 2L -> (("two", 2L)), 3L -> (("three", 12L))))

    // batch 2 (LATE — all seqs older than the target's): an update and a
    // delete for k=1 and a stale re-insert attempt for k=3 must all be
    // no-ops; only the genuinely-new k=4 lands
    input.addData((1L, "stale", "U", 5L), (1L, "", "D", 6L),
      (3L, "stale3", "U", 11L), (4L, "four", "U", 20L))
    q.processAllAvailable()
    assert(state() == Map(1L -> (("uno", 10L)), 2L -> (("two", 2L)),
      3L -> (("three", 12L)), 4L -> (("four", 20L))),
      s"late batch leaked: ${state()}")

    // batch 3 replays batch 1 verbatim (restart-replay): equal seqs are
    // not-newer, so the state converges instead of double-applying
    input.addData((1L, "uno", "U", 10L), (3L, "three", "U", 12L))
    q.processAllAvailable()
    assert(state() == Map(1L -> (("uno", 10L)), 2L -> (("two", 2L)),
      3L -> (("three", 12L)), 4L -> (("four", 20L))))

    // a genuinely newer delete still lands through the guard
    input.addData((1L, "", "D", 30L))
    q.processAllAvailable()
    assert(state() == Map(2L -> (("two", 2L)), 3L -> (("three", 12L)),
      4L -> (("four", 20L))))
    q.stop()
  }

  test("CDC upsert sink into a partitioned SNAPSHOT table: one manifest per batch (r14)") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-sn").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_cs", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_cs.dir", dir)
    spark.sql("CREATE TABLE graft_cs.main.state (k BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p) TBLPROPERTIES ('snapshots'='true')")
    spark.sql("INSERT INTO graft_cs.main.state VALUES " +
      "(1, 'one', 0), (2, 'two', 0), (3, 'three', 1)")

    val input = MemoryStream[(Long, String, Int, String, Long)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "v", "p", "op", "seq"),
      "graft_cs.main.state", Seq("k", "p"), "op", "seq",
      java.nio.file.Files.createTempDirectory("graft-cdc-snck").toString)

    def state(): Map[Long, (String, Int)] =
      spark.sql("SELECT k, v, p FROM graft_cs.main.state").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap

    // batch 1: update in p=0, delete in p=1, insert into a NEW partition —
    // all three land as ONE manifest commit (the merge's group-scoped
    // write goes through the snapshot path)
    input.addData((1L, "uno", 0, "U", 10L), (3L, "", 1, "D", 11L),
      (4L, "four", 2, "U", 12L))
    q.processAllAvailable()
    assert(state() == Map(1L -> (("uno", 0)), 2L -> (("two", 0)),
      4L -> (("four", 2))), s"got ${state()}")

    // the batch produced exactly one new manifest version
    val tdir = new Path(s"$dir/state")
    val fs = tdir.getFileSystem(spark.sessionState.newHadoopConf())
    val vsAfter1 = graft.catalog.Snapshots.versions(fs, tdir)
    // v1 create, v2 insert, v3 the CDC batch (older manifests pruned under
    // default retention, so check the CURRENT version, not the count)
    assert(graft.catalog.Snapshots.current(fs, tdir).get.version == 3L,
      s"have versions $vsAfter1")

    // batch 2 converges after replay-style duplicates within the batch
    input.addData((4L, "stale", 2, "U", 20L), (4L, "FOUR", 2, "U", 21L))
    q.processAllAvailable()
    assert(state() == Map(1L -> (("uno", 0)), 2L -> (("two", 0)),
      4L -> (("FOUR", 2))))
    assert(graft.catalog.Snapshots.current(fs, tdir).get.version == 4L)
    q.stop()
  }

  test("CDC upsert sink: all-key target omits the malformed empty UPDATE SET (r13 ADVICE)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-k").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_ck", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_ck.dir", dir)
    // every data column is a key (a membership set); key case differs from
    // the incoming frame's to pin the case-insensitive key matching
    spark.sql("CREATE TABLE graft_ck.main.members AS SELECT CAST(1 AS BIGINT) AS K")

    val input = MemoryStream[(Long, String, Long)]
    val q = EventStreams.upsertSink(
      input.toDF().toDF("k", "op", "seq"),
      "graft_ck.main.members", Seq("k"), "op", "seq",
      java.nio.file.Files.createTempDirectory("graft-cdc-kck").toString)

    def members(): Set[Long] =
      spark.sql("SELECT K FROM graft_ck.main.members").collect()
        .map(_.getLong(0)).toSet

    // re-upsert of an existing key (matched, nothing to set), one insert,
    // one delete — the batch must not produce malformed SQL
    input.addData((1L, "U", 1L), (2L, "U", 2L))
    q.processAllAvailable()
    assert(members() == Set(1L, 2L))
    input.addData((1L, "D", 3L), (3L, "U", 4L))
    q.processAllAvailable()
    assert(members() == Set(2L, 3L))
    q.stop()
  }
  test("snapshot manifest-tail source: one micro-batch per commit, restart resumes at checkpoint (r15)") {
    val dir = Files.createTempDirectory("graft-tail").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_tl", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tl.dir", dir)
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "10")
    try {
      spark.sql("CREATE TABLE graft_tl.main.t (v BIGINT, k INT) PARTITIONED BY (k) " +
        "TBLPROPERTIES ('snapshots'='true')")
      spark.sql("INSERT INTO graft_tl.main.t SELECT id, CAST(id % 2 AS INT) FROM range(5)")

      val checkpoint = Files.createTempDirectory("graft-tail-ck").toFile.getAbsolutePath
      val batches = new scala.collection.mutable.ArrayBuffer[(Long, Set[Long])]()
      def startStream() = spark.readStream
        .format("graft.streaming.SnapshotTailProvider")
        .option("path", s"$dir/t")
        .load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized {
            batches += ((id, df.collect().map(_.getAs[Long]("v")).toSet))
          }
          ()
        }
        .start()

      val q = startStream()
      q.processAllAvailable()
      // batch 0: the snapshot current at start (the 5 inserted rows)
      assert(batches.synchronized(batches.toList).map(_._2) == List(Set(0L, 1L, 2L, 3L, 4L)))

      spark.sql("INSERT INTO graft_tl.main.t VALUES (100, 0)")
      q.processAllAvailable()
      spark.sql("INSERT INTO graft_tl.main.t VALUES (200, 1), (201, 0)")
      q.processAllAvailable()
      q.stop()
      // one micro-batch per commit, each exactly the added rows
      assert(batches.synchronized(batches.toList).map(_._2) ==
        List(Set(0L, 1L, 2L, 3L, 4L), Set(100L), Set(200L, 201L)),
        s"got ${batches.toList}")

      // restart from the checkpoint: only commits AFTER it appear
      spark.sql("INSERT INTO graft_tl.main.t VALUES (300, 0)")
      val q2 = startStream()
      q2.processAllAvailable()
      q2.stop()
      val after = batches.synchronized(batches.toList)
      assert(after.last._2 == Set(300L), s"restart replayed: $after")
      assert(after.map(_._2).count(_ == Set(300L)) == 1)
    } finally prevH match {
      case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
      case None => spark.conf.unset(graft.catalog.History.Key)
    }
  }
  test("snapshot tail feed=changes: row-level op stream per commit (r15)") {
    val dir = Files.createTempDirectory("graft-tailc").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graft_tc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_tc.dir", dir)
    val prevH = spark.conf.getOption(graft.catalog.History.Key)
    spark.conf.set(graft.catalog.History.Key, "10")
    try {
      spark.sql("CREATE TABLE graft_tc.main.t (v BIGINT, k INT) PARTITIONED BY (k) " +
        "TBLPROPERTIES ('snapshots'='true', 'changelog'='true')")
      spark.sql("INSERT INTO graft_tc.main.t SELECT id, CAST(id % 2 AS INT) FROM range(4)")

      val checkpoint = Files.createTempDirectory("graft-tailc-ck").toFile.getAbsolutePath
      val batches = new scala.collection.mutable.ArrayBuffer[Set[(Long, String)]]()
      val q = spark.readStream
        .format("graft.streaming.SnapshotTailProvider")
        .option("path", s"$dir/t")
        .option("feed", "changes")
        .load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          batches.synchronized {
            batches += df.collect().map(r =>
              (r.getAs[Long]("v"), r.getAs[String]("_change_op"))).toSet
          }
          ()
        }
        .start()
      q.processAllAvailable()
      // initial load: the whole current snapshot as inserts
      assert(batches.synchronized(batches.toList) ==
        List((0L to 3L).map(v => (v, "I")).toSet))

      // an UPDATE commit streams as a D(old)+I(new) pair
      spark.sql("UPDATE graft_tc.main.t SET v = v + 100 WHERE v = 2")
      q.processAllAvailable()
      // a partition-predicate DELETE streams as synthesized deletes
      spark.sql("DELETE FROM graft_tc.main.t WHERE k = 1")
      q.processAllAvailable()
      q.stop()
      val got = batches.synchronized(batches.toList)
      assert(got(1) == Set((2L, "D"), (102L, "I")), s"update batch: ${got(1)}")
      assert(got(2) == Set((1L, "D"), (3L, "D")), s"delete batch: ${got(2)}")
    } finally prevH match {
      case Some(v) => spark.conf.set(graft.catalog.History.Key, v)
      case None => spark.conf.unset(graft.catalog.History.Key)
    }
  }
}
