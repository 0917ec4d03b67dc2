package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.sources.{Multimodal, Tables}

/** Multimodal plumbing: binary column contract, typed metadata, REAL PNG
  * decode/resize via javax.imageio, partition-parallel feature kernel.
  */
class MultimodalSpec extends SparkSpec {

  test("asMedia produces binary payloads with deterministic kinds") {
    val media = Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text")
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // image payloads are real PNGs, audio payloads are real WAVs, video
    // payloads are real GV01 containers (magic bytes each)
    val r = media.join(Tables(spark, sfDir, "documents"), "doc_id")
      .select("kind", "media", "text").limit(9).collect()
    r.foreach { row =>
      val bytes = row.getAs[Array[Byte]](1)
      row.getString(0) match {
        case "image" =>
          assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N',
            "image payload must be a real PNG")
        case "audio" =>
          assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F',
            "audio payload must be a real WAV (RIFF header)")
        case _ =>
          assert(bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == '0' && bytes(3) == '1',
            "video payload must be a GV01 motion-PNG container")
      }
    }
  }

  test("decodeMeta performs REAL audio decode: duration/rate round-trip through WAV bytes") {
    import spark.implicits._
    val rows = Seq(
      (1L, Multimodal.wavBytes(4096, seed = 5L), "audio"), // 0.5 s exactly
      (4L, Multimodal.wavBytes(12288, seed = 6L), "audio"), // 1.5 s exactly
      (7L, "definitely not a wav".getBytes(StandardCharsets.UTF_8), "audio"),
      (0L, Multimodal.pngBytes(20, 20, seed = 1L), "image")
    ).toDF("doc_id", "media", "kind")
    val got = Multimodal.decodeMeta(rows).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(5)) -1.0 else r.getDouble(5)),
          if (r.isNullAt(6)) -1 else r.getInt(6)))
      .toMap
    assert(got(1L) == ((0.5, 8192)), s"got ${got(1L)}")
    assert(got(4L) == ((1.5, 8192)), s"got ${got(4L)}")
    assert(got(7L) == ((-1.0, -1)), "undecodable audio bytes must yield null duration/rate")
    assert(got(0L) == ((-1.0, -1)), "image rows carry no audio metadata")
  }

  test("decodeMeta performs REAL image decode: dims round-trip through PNG bytes") {
    import spark.implicits._
    // construct PNGs of known dimensions, decode them back, and include
    // undecodable bytes — the honest null path for a broken payload
    val rows = Seq(
      (0L, Multimodal.pngBytes(33, 21, seed = 7L), "image"),
      (3L, Multimodal.pngBytes(128, 64, seed = 9L), "image"),
      (6L, "not a png at all".getBytes(StandardCharsets.UTF_8), "image"),
      (1L, "audio payload bytes".getBytes(StandardCharsets.UTF_8), "audio")
    ).toDF("doc_id", "media", "kind")
    val got = Multimodal.decodeMeta(rows).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) -1 else r.getInt(3)), if (r.isNullAt(4)) -1 else r.getInt(4)))
      .toMap
    assert(got(0L) == ((33, 21)), s"got ${got(0L)}")
    assert(got(3L) == ((128, 64)), s"got ${got(3L)}")
    assert(got(6L) == ((-1, -1)), "undecodable image bytes must yield null dims")
    assert(got(1L) == ((-1, -1)), "audio rows carry no image dims")
  }

  test("decoded dimensions equal the synthesis formula on the corpus (oracle contract)") {
    val docs = Tables(spark, sfDir, "documents")
    val meta = Multimodal.decodeMeta(Multimodal.asMedia(docs, "doc_id", "text"))
      .filter(col("kind") === "image")
    val joined = meta.join(docs, "doc_id")
      .select(col("doc_id"), col("width"), col("height"),
        (octet_length(col("text")) % 64 + 16).as("ew"),
        (octet_length(col("text")) % 48 + 16).as("eh"))
    assert(joined.count() > 0)
    assert(joined.filter(col("width") =!= col("ew") || col("height") =!= col("eh"))
      .count() == 0, "decoded dims must match the deterministic synthesis formula")
  }

  test("featureExtract: decoded-domain cell/segment means match the synthesis formulas") {
    val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") < 12)
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.featureExtract(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    assert(feats.keySet == texts.keySet && feats.nonEmpty)
    // recompute every vector from the synthesis formulas WITHOUT decoding —
    // agreement proves the kernel really decoded (the frameChannelSums
    // argument applied to the feature kernel)
    texts.foreach { case (id, text) =>
      val n = text.getBytes("UTF-8").length
      val ref: Array[Long] = (id % 3) match {
        case 0 =>
          val (w, h) = (n % 64 + 16, n % 48 + 16)
          val sums = new Array[Long](48); val cnts = new Array[Long](16)
          for (y <- 0 until h; x <- 0 until w) {
            val c = (y * 4 / h) * 4 + x * 4 / w
            val v = (x * 31 + y * 17 + id) & 0xffffff
            sums(c * 3) += (v >> 16) & 0xff; sums(c * 3 + 1) += (v >> 8) & 0xff
            sums(c * 3 + 2) += v & 0xff; cnts(c) += 1
          }
          Array.tabulate(48)(i => sums(i) / cnts(i / 3))
        case 1 =>
          val sums = new Array[Long](48); val cnts = new Array[Long](48)
          for (i <- 0 until n) {
            val seg = (i.toLong * 48 / n).toInt
            sums(seg) += (i * 2654435761L + id) & 0xffffL; cnts(seg) += 1
          }
          Array.tabulate(48)(s => if (cnts(s) == 0) 0L else sums(s) / cnts(s))
        case _ =>
          val nf = n % 24 + 1
          val sums = new Array[Long](48); val cnts = new Array[Long](16)
          for (f <- 0 until nf; y <- 0 until 12; x <- 0 until 16) {
            val c = (y * 4 / 12) * 4 + x * 4 / 16
            val v = (x * 31 + y * 17 + id * 131 + f) & 0xffffff
            sums(c * 3) += (v >> 16) & 0xff; sums(c * 3 + 1) += (v >> 8) & 0xff
            sums(c * 3 + 2) += v & 0xff; cnts(c) += 1
          }
          Array.tabulate(48)(i => sums(i) / cnts(i / 3))
      }
      val got = feats(id)
      assert(got.length == 48, s"doc $id dim ${got.length}")
      assert(got.map(_.toLong).toSeq == ref.toSeq,
        s"doc $id (kind ${id % 3}): ${got.toSeq} vs ${ref.toSeq}")
    }
  }

  test("imageHash: deterministic on identical pixels, sensitive to a brightened cell, dedup via hammingPairs") {
    import spark.implicits._
    import graft.operators.Dedup
    // two docs with identical text length and ids differing by a small even
    // multiple of 3 produce near-identical rasters (the gray shift moves all
    // cells together), a far id produces an unrelated pattern
    val media = Multimodal.asMedia(
      Seq((0L, "abcdefghij"), (1000002L, "abcdefghij"), (54L, "zz"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val hashes = Multimodal.imageHash(media)
    val got = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 3, "every decodable image row hashes")
    // determinism: re-running yields identical hashes
    assert(Multimodal.imageHash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == got)
    // hammingPairs == brute force on these hashes at every threshold
    for (k <- Seq(0, 8, 20)) {
      val pairs = Dedup.hammingPairs(hashes, "doc_id", "phash", maxHamming = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val ids = got.keys.toSeq.sorted
      val brute = (for {
        i <- ids.indices; j <- (i + 1) until ids.size
        h = java.lang.Long.bitCount(got(ids(i)) ^ got(ids(j)))
        if h <= k
      } yield (ids(i), ids(j), h)).toSet
      assert(pairs == brute, s"hammingPairs(k=$k) must equal brute force")
    }
  }

  test("hammingPairs: planted flips recovered exactly at the pigeonhole bound") {
    import spark.implicits._
    import graft.operators.Dedup
    // base hashes spread far apart; planted neighbors at exact bit distances
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, rnd.nextLong()))
    val planted = base.take(10).zipWithIndex.map { case ((id, h), i) =>
      // flip i+1 distinct bits of h (positions i*5..i*5+i)
      val flipped = (0 to i).foldLeft(h)((acc, b) => acc ^ (1L << ((i * 5 + b) % 64)))
      (id + 1000L, flipped)
    }
    // plus a clone flood: 30 ids sharing ONE hash value — the exact-dup
    // collapse must emit all C(30,2) pairs even when maxBucket is tiny
    // (pre-collapse, the salt split would scatter them across salt groups
    // and silently drop cross-salt pairs)
    val clones = (0 until 30).map(i => (5000L + i, base.head._2))
    val df = (base ++ planted ++ clones).toDF("doc_id", "phash")
    val k = 6
    val all = base ++ planted ++ clones
    val brute = (for {
      i <- all.indices; j <- (i + 1) until all.size
      (ia, ha) = all(i); (ib, hb) = all(j)
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= k
    } yield (math.min(ia, ib), math.max(ia, ib), h)).toSet
    // ample maxBucket: the full pair set, exactly
    val pairs = Dedup.hammingPairs(df, "doc_id", "phash", maxHamming = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == brute, "banded blocking must lose no pair within the bound")
    // tiny maxBucket: near-miss pairs in hot buckets may trade recall
    // (documented), but identical-hash pairs are IMMUNE — the exact-dup
    // collapse emits them outside the salted path entirely
    val tight = Dedup.hammingPairs(df, "doc_id", "phash", maxHamming = k,
      maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(tight.subsetOf(brute), "no false pairs under salting")
    val h0 = brute.filter(_._3 == 0)
    assert(h0.subsetOf(tight),
      "clone-flood pairs must survive ANY maxBucket (exact-dup collapse)")
    assert(h0.size >= 465, s"fixture must plant a clone flood, got ${h0.size}")
  }

  test("hammingClusters ≡ clusters∘hammingPairs labels, plus null/singleton self-labels") {
    import spark.implicits._
    import graft.operators.Dedup
    // the planted-flip fixture again, plus a clone flood, an isolated hash
    // (no neighbor within k), and an undecodable (null-fp) doc
    val rnd = new scala.util.Random(7)
    val base = (0L until 40L).map(i => (i, rnd.nextLong()))
    val planted = base.take(10).zipWithIndex.map { case ((id, h), i) =>
      val flipped = (0 to i).foldLeft(h)((acc, b) => acc ^ (1L << ((i * 5 + b) % 64)))
      (id + 1000L, flipped)
    }
    val clones = (0 until 30).map(i => (5000L + i, base.head._2))
    val all = base ++ planted ++ clones
    val k = 6
    val df = all.map { case (id, h) => (id, Some(h)) }
      .:+((9999L, Option.empty[Long]))
      .toDF("doc_id", "phash")
    // expected: union-find over brute-force pairs; untouched docs self-label
    val parent = scala.collection.mutable.Map(all.map(t => t._1 -> t._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      i <- all.indices; j <- (i + 1) until all.size
      if java.lang.Long.bitCount(all(i)._2 ^ all(j)._2) <= k
    } {
      val (ra, rb) = (find(all(i)._1), find(all(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = all.map(t => t._1 -> find(t._1)).toMap + (9999L -> 9999L)
    val got = Dedup.hammingClusters(df, "doc_id", "phash", maxHamming = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, "hammingClusters must match union-find over brute pairs")
    // sanity: the fixture exercises all three shapes
    assert(expect(5029L) == 0L, "clone flood folds into the base component")
    assert(expect.values.toSet.size >= 10, "fixture must keep some singletons")
  }

  test("hammingIncremental: direct-edge history drop + within-batch keep-min ≡ brute force") {
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(11)
    val k = 4
    val hist = (0L until 20L).map(i => (i, rnd.nextLong()))
    // batch: 1-bit flips of a history hash (must drop), a fresh 3-clique
    // (keep min id), fresh singletons (keep), an undecodable null fp (keep)
    val histHit = (100L until 103L).map(i => (i, hist.head._2 ^ (1L << (i % 64).toInt)))
    val freshBase = rnd.nextLong()
    val clique = Seq((200L, freshBase), (201L, freshBase ^ 3L), (202L, freshBase ^ 1L))
    val singles = (300L until 303L).map(i => (i, rnd.nextLong()))
    val batch = histHit ++ clique ++ singles
    val batchDf = batch.map { case (id, h) => (id, Some(h)) }
      .:+((999L, Option.empty[Long])).toDF("doc_id", "phash")
    val state = Dedup.hammingState(hist.toDF("doc_id", "phash"), "doc_id", "phash",
      maxHamming = k)
    // expected, brute-forced from the actual values: direct-edge history
    // drop, then union-find keep-min over the remainder, nulls survive
    val hitIds = batch.filter { case (_, h) =>
      hist.exists(t => java.lang.Long.bitCount(t._2 ^ h) <= k) }.map(_._1).toSet
    val rem = batch.filterNot(t => hitIds(t._1))
    val parent = scala.collection.mutable.Map(rem.map(t => t._1 -> t._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      i <- rem.indices; j <- (i + 1) until rem.size
      if java.lang.Long.bitCount(rem(i)._2 ^ rem(j)._2) <= k
    } {
      val (ra, rb) = (find(rem(i)._1), find(rem(j)._1))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = rem.map(_._1).filter(id => find(id) == id).toSet + 999L
    val got = Dedup.hammingIncremental(batchDf, "doc_id", "phash", state,
      maxHamming = k).collect().map(_.getLong(0)).toSet
    assert(got == expect, s"got ${got.toSeq.sorted} expect ${expect.toSeq.sorted}")
    // fixture sanity: all three shapes actually exercised
    assert(histHit.map(_._1).forall(hitIds), "flips must land within k of history")
    assert(expect.contains(200L) && !expect.contains(201L) && !expect.contains(202L),
      "clique must keep exactly its min id")
    // state is distinct-by-construction: a clone flood of one fingerprint
    // contributes exactly maxHamming+1 band rows, never per-doc rows
    val flood = (0 until 100).map(i => (1000L + i, 42L)).toDF("doc_id", "phash")
    assert(Dedup.hammingState(flood, "doc_id", "phash", k).count() == k + 1L)
  }

  test("hammingIncremental guards: band-layout mismatch and bad maxHamming error loudly") {
    import spark.implicits._
    import graft.operators.Dedup
    val hist = Seq((0L, 7L), (1L, 99L)).toDF("doc_id", "phash")
    val batch = Seq((10L, 7L)).toDF("doc_id", "phash")
    // a state built at maxHamming=4 has a different chunk layout than a probe
    // at 8 — pre-guard this silently missed every history duplicate
    val state4 = Dedup.hammingState(hist, "doc_id", "phash", maxHamming = 4)
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingIncremental(batch, "doc_id", "phash", state4, maxHamming = 8)
    }
    assert(e.getMessage.contains("band layout mismatch"), e.getMessage)
    // matching layouts pass the guard
    assert(Dedup.hammingIncremental(batch, "doc_id", "phash", state4,
      maxHamming = 4).count() == 0L)
    // bad maxHamming fails the local require, not a bare div-by-zero deep in
    // chunkStructs
    intercept[IllegalArgumentException] {
      Dedup.hammingIncremental(batch, "doc_id", "phash", state4, maxHamming = -1)
    }
    // empty state has no layout to disagree with (first batch)
    val empty = state4.filter(lit(false))
    assert(Dedup.hammingIncremental(batch, "doc_id", "phash", empty,
      maxHamming = 8).count() == 1L)
  }

  test("hammingIncremental hot-bucket salting stays exact: tiny maxBucket ≡ unbounded") {
    import spark.implicits._
    import graft.operators.Dedup
    val rnd = new scala.util.Random(23)
    val k = 4
    // history concentrated so several (chunk, ch) buckets exceed maxBucket=2:
    // 40 fps sharing the same low 32 bits (chunks 0..1 identical) + spread fps
    val hotLow = rnd.nextLong() & 0xFFFFFFFFL
    val hist = (0L until 40L).map(i => (i, (rnd.nextLong() << 32) | hotLow)) ++
      (50L until 60L).map(i => (i, rnd.nextLong()))
    val batch = (100L until 140L).map { i =>
      // half the batch flips ≤k bits of some history fp, half is fresh
      if (i % 2 == 0) (i, hist((i % 50).toInt % hist.size)._2 ^ (1L << (i % 60).toInt))
      else (i, rnd.nextLong())
    }
    val histDf = hist.toDF("doc_id", "phash")
    val batchDf = batch.toDF("doc_id", "phash")
    val state = Dedup.hammingState(histDf, "doc_id", "phash", maxHamming = k)
    val unbounded = Dedup.hammingIncremental(batchDf, "doc_id", "phash", state,
      maxHamming = k, maxBucket = Int.MaxValue).collect().map(_.getLong(0)).toSet
    val salted = Dedup.hammingIncremental(batchDf, "doc_id", "phash", state,
      maxHamming = k, maxBucket = 2).collect().map(_.getLong(0)).toSet
    // probe-exploded state salting loses nothing: identical survivor sets
    assert(salted == unbounded, s"salted=$salted unbounded=$unbounded")
    assert(unbounded.nonEmpty && unbounded.size < batch.size,
      "fixture must both drop and keep some batch rows")
  }

  test("resize REALLY rescales: output PNGs re-decode at the scaled dimensions") {
    val media = Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text")
    val resized = Multimodal.resize(media, maxSide = 24)
    val redecoded = Multimodal.decodeMeta(
      resized.select(col("doc_id"), col("media"), lit("image").as("kind")))
    val checked = resized.select("doc_id", "new_width", "new_height")
      .join(redecoded.select("doc_id", "width", "height"), "doc_id")
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (nw, nh, w, h) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(nw <= 24 && nh <= 24, s"doc ${r.getLong(0)}: $nw x $nh exceeds box")
      assert(w == nw && h == nh,
        s"doc ${r.getLong(0)}: re-decoded $w x $h != claimed $nw x $nh")
    }
  }

  test("video GV01 container: real parse round-trip, frame decode, sampling arithmetic") {
    val media = Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text")
      .filter(col("kind") === "video")
    val docs = Tables(spark, sfDir, "documents").filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), octet_length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(docs.nonEmpty)

    // decodeMeta: frame count and declared source size come from the header
    val meta = Multimodal.decodeMeta(media)
      .select("doc_id", "n_bytes", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    docs.foreach { case (id, n) =>
      assert(meta(id) == ((n, n % 24 + 1)),
        s"doc $id: decoded ${meta(id)}, expected ($n, ${n % 24 + 1})")
    }

    // sampleFrames: every 4th frame, each one a REAL 16x12 PNG decode
    val frames = Multimodal.sampleFrames(media, everyK = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(frames.nonEmpty)
    frames.foreach { case (id, fno, w, h, nb) =>
      assert(fno % 4 == 0 && w == 16 && h == 12 && nb > 0,
        s"doc $id frame $fno: $w x $h ($nb bytes)")
    }
    val perDoc = frames.groupBy(_._1).view.mapValues(_.length).toMap
    docs.foreach { case (id, n) =>
      val expect = (n % 24 + 1 + 3) / 4
      assert(perDoc(id) == expect, s"doc $id: sampled ${perDoc(id)}, expected $expect")
    }

    // corrupted payload -> honest nulls, no crash; includes a hostile frame
    // length (valid magic, 2 GB declared frame) that must not allocate
    val spark2 = spark
    import spark2.implicits._
    val hostile = {
      val out = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(out)
      dos.write("GV01".getBytes); dos.writeInt(10); dos.writeInt(1)
      dos.writeInt(Int.MaxValue); dos.write(Array[Byte](1, 2, 3)); dos.flush()
      out.toByteArray
    }
    val bad = Seq(
      (1L, "not a container".getBytes, "video"),
      (2L, hostile, "video")).toDF("doc_id", "media", "kind")
    val badMeta = Multimodal.decodeMeta(bad).select("n_bytes", "n_frames").collect()
    assert(badMeta.length == 2 && badMeta.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(Multimodal.sampleFrames(bad, 2).count() == 0)
  }

  test("audioSampleSums: decoded PCM sums equal the synthesis formula; corrupt WAV skipped") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (4L, "a longer audio payload text goes here"))
      .toDF("doc_id", "text") // doc_id % 3 == 1 → audio kind
    val got = Multimodal.audioSampleSums(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for ((id, text) <- Seq((1L, "abcdef"), (4L, "a longer audio payload text goes here"))) {
      val n = text.getBytes("UTF-8").length
      val expect = (0 until n).map(i => ((i * 2654435761L + id) & 0xffffL) - 32768L).sum
      assert(got(id) == ((n.toLong, expect)),
        s"doc $id: got ${got(id)}, expected ($n, $expect)")
    }
    // corrupt payload → absent row, not a task failure
    val bad = Seq((7L, "not a wav at all".getBytes, "audio"))
      .toDF("doc_id", "media", "kind")
    assert(Multimodal.audioSampleSums(bad).count() == 0)
  }

  test("frameChannelSums: decoded per-channel sums equal the synthesis formula exactly") {
    import spark.implicits._
    val docs = Seq((2L, "abcdef"), (5L, "a longer video payload text here"), (8L, ""))
      .toDF("doc_id", "text") // all doc_id % 3 == 2 → video kind
    val got = Multimodal.frameChannelSums(Multimodal.asMedia(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val expect = (for {
      (id, text) <- Seq((2L, "abcdef"), (5L, "a longer video payload text here"), (8L, ""))
      nf = text.getBytes("UTF-8").length % 24 + 1
      f <- 0 until nf
    } yield {
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until 12; x <- 0 until 16) {
        val v = (x * 31 + y * 17 + id * 131 + f) & 0xffffff
        sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
      }
      (id, f) -> ((sr, sg, sb))
    }).toMap
    assert(got == expect, s"decoded sums diverge from formula: ${got.toSeq.diff(expect.toSeq).take(3)}")
  }

  test("decodeMeta kinds get the right metadata columns") {
    val meta = Multimodal.decodeMeta(
      Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text"))
    val byKind = meta.groupBy("kind").agg(
      count(col("width")).as("w"), count(col("duration_s")).as("d"),
      count(col("n_frames")).as("f"), count("*").as("n")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byKind("image")._1 == byKind("image")._4 && byKind("image")._2 == 0)
    assert(byKind("audio")._2 == byKind("audio")._4 && byKind("audio")._1 == 0)
    assert(byKind("video")._3 == byKind("video")._4 && byKind("video")._2 == 0)
  }
}
