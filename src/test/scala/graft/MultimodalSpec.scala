package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.sources.{Multimodal, Tables}

/** Multimodal plumbing: binary column contract, typed metadata, partition-parallel
  * feature kernel. The decode math is a stub; the schema/partitioning/batching
  * contract is what these tests pin down.
  */
class MultimodalSpec extends SparkSpec {

  test("asMedia produces binary payloads with deterministic kinds") {
    val media = Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text")
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    // payload bytes are the raw UTF-8 text (stand-in), not lossy
    val r = media.join(Tables(spark, sfDir, "documents"), "doc_id")
      .select("media", "text").limit(3).collect()
    r.foreach { row =>
      assert(new String(row.getAs[Array[Byte]](0), StandardCharsets.UTF_8) == row.getString(1))
    }
  }

  test("featureExtract: fixed-dim, L1-normalized, matches a local reference") {
    val media = Multimodal.asMedia(
      Tables(spark, sfDir, "documents").filter(col("doc_id") < 5), "doc_id", "text")
    val feats = Multimodal.featureExtract(media, dim = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val texts = Tables(spark, sfDir, "documents").filter(col("doc_id") < 5)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    assert(feats.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val bytes = text.getBytes(StandardCharsets.UTF_8)
      val ref = new Array[Float](16)
      bytes.foreach(b => ref((b & 0xff) % 16) += 1f)
      (0 until 16).foreach(i => ref(i) /= bytes.length.toFloat)
      val got = feats(id)
      assert(got.length == 16)
      (0 until 16).foreach(i => assert(math.abs(got(i) - ref(i)) < 1e-6f,
        s"doc $id bin $i: ${got(i)} vs ${ref(i)}"))
      assert(math.abs(got.sum - 1.0f) < 1e-4f, "features must be L1-normalized")
    }
  }

  test("resize fits images inside the bounding box, preserving aspect") {
    val media = Multimodal.asMedia(Tables(spark, sfDir, "documents"), "doc_id", "text")
    val resized = Multimodal.resize(media, maxSide = 64).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      assert(w <= 64 && h <= 64, s"doc ${r.getLong(0)}: $w x $h exceeds box")
      assert(w >= 1 && h >= 1)
      assert(r.getAs[Array[Byte]](3).nonEmpty)
    }
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
