package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension). Media are opaque BINARY
  * columns + typed metadata; transforms run per-partition over Arrow-sized batches.
  *
  * The container has no image/audio codecs, so the decode kernel is a clearly
  * marked DETERMINISTIC STUB (dimensions derived from the byte stream) — but the
  * Spark-side contract is real: schema, binary column handling, partition-parallel
  * decode, and metadata extraction all behave exactly as they would with a real
  * codec behind the same signature.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("kind", StringType)))

  /** Wrap a text corpus as a binary media column (stand-in for real image/audio
    * payload bytes; deterministic).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      graft.operators.Keys.id(docs, idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("media"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio")
        .otherwise("video").as("kind"))

  /** STUB decode: metadata a real decoder would emit (width/height/duration/frames)
    * derived deterministically from the payload size. A production build swaps the
    * expressions for a mapPartitions/Arrow kernel calling the actual codec; the
    * output schema and partitioning contract are unchanged.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val bytes = length(col("media"))
    media.select(
      col("doc_id"),
      col("kind"),
      bytes.as("n_bytes"),
      when(col("kind") === "image", pmod(bytes, lit(640)) + 16).otherwise(null)
        .cast("int").as("width"),
      when(col("kind") === "image", pmod(bytes, lit(480)) + 16).otherwise(null)
        .cast("int").as("height"),
      when(col("kind") === "audio", round(bytes / lit(16.0), 2)).otherwise(null)
        .cast("double").as("duration_s"),
      when(col("kind") === "video", pmod(bytes, lit(24)) + 1).otherwise(null)
        .cast("int").as("n_frames"))
  }

  /** STUB frame sampler for video media: emits every k-th "frame" (byte-slice
    * stand-in). Real impl: mapPartitions + codec; identical shape/partitioning.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"),
        posexplode(split(base64(col("media")), "(?<=\\G.{32})")).as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % everyK === 0 && length(col("frame")) > 0)

  /** STUB resize for image media: computes the scaled-to-fit dimensions for a
    * bounding box and a proportionally truncated payload stand-in. A real
    * implementation swaps the byte-slice for a codec resample behind the same
    * (doc_id, new_width, new_height, media) contract.
    */
  def resize(media: DataFrame, maxSide: Int): DataFrame =
    decodeMeta(media).filter(col("kind") === "image")
      .join(media.select("doc_id", "media"), "doc_id")
      .withColumn("scale",
        least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height"))))
      .select(
        col("doc_id"),
        ceil(col("width") * col("scale")).cast("int").as("new_width"),
        ceil(col("height") * col("scale")).cast("int").as("new_height"),
        expr("substring(media, 1, greatest(1, cast(n_bytes * scale * scale as int)))")
          .as("media"))

  /** Partition-parallel feature extraction over the binary column — the
    * mapPartitions kernel contract a real codec plugs into: one iterator pass
    * per partition, per-partition (not per-row) kernel setup, fixed-width
    * Array[Float] feature output. The DECODE STEP IS A DETERMINISTIC STUB
    * (a 16-bin byte histogram, L1-normalized, standing in for e.g. an image
    * embedding); schema, batching, and partitioning are the real contract.
    */
  def featureExtract(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition kernel init happens HERE (a real impl opens the codec once)
        rows.map { case (id, bytes) =>
          val hist = new Array[Float](dim)
          if (bytes != null && bytes.nonEmpty) {
            var i = 0
            while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
            var j = 0
            while (j < dim) { hist(j) /= bytes.length.toFloat; j += 1 }
          }
          (id, hist)
        }
      }
      .toDF("doc_id", "features")
  }
}
