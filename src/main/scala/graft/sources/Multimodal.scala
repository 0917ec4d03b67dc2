package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension). Media are opaque BINARY
  * columns + typed metadata; transforms run per-partition over the binary
  * payloads with per-partition (not per-row) kernel setup — the contract a
  * production codec plugs into.
  *
  * Image decode, metadata extraction, and resize are REAL: payloads are PNG
  * bytes and the kernels run `javax.imageio` (in the JVM, no external codec).
  * Audio decode is REAL too: payloads are WAV (16-bit mono PCM) and the kernel
  * reads frame count / sample rate through `javax.sound.sampled` — file-format
  * parsing only, no audio hardware involved. Video remains a deterministic
  * byte-payload STUB (the JVM ships no video codec): its metadata derives from
  * payload size behind the same kernel signature a real decoder would use.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("kind", StringType)))

  /** Deterministic PNG of the given dimensions: pixel (x,y) is a pure function
    * of (x, y, seed), so the same doc always produces the same image.
    */
  private[graft] def pngBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((x * 31 + y * 17 + seed) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic 16-bit mono PCM WAV at 8192 Hz with `nSamples` samples:
    * sample i is a pure function of (i, seed), so the same doc always produces
    * the same audio. The power-of-two sample rate makes
    * `duration = nSamples / 8192.0` an EXACT double, so an external oracle can
    * compute the decoded duration from the sample count with no rounding.
    */
  private[graft] def wavBytes(nSamples: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((i * 2654435761L + seed) & 0xffffL) - 32768L).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8192f, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
    out.toByteArray
  }

  /** Wrap a text corpus as binary media. Image-kind docs (doc_id % 3 == 0) get
    * REAL PNG payloads whose dimensions derive from the text's UTF-8 byte
    * length (width = n % 64 + 16, height = n % 48 + 16); audio-kind docs
    * (doc_id % 3 == 1) get REAL WAV payloads with one sample per text byte —
    * formulas an external oracle can compute without decoding, so
    * `decodeMeta`'s decoded dimensions/duration are checkable end-to-end.
    * Video docs carry the raw text bytes (payload stand-in).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // kind derivation (id % 3) genuinely needs a numeric id, so unlike the
    // other Keys.id callers a non-integral key must fail here, loudly — not
    // as a null from a silent string→long cast inside the encoder
    val idType = docs.select(col(idCol)).schema.head.dataType
    idType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"asMedia id column '$idCol' must be integral (kind = id % 3); " +
          s"got ${other.simpleString}")
    }
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes = Option(text).getOrElse("").getBytes("UTF-8")
          val kind = id % 3 match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          val media = kind match {
            case "image" => pngBytes(bytes.length % 64 + 16, bytes.length % 48 + 16, id)
            case "audio" => wavBytes(bytes.length, id)
            case _ => bytes
          }
          (id, media, kind)
        }
      }
      .toDF("doc_id", "media", "kind")
  }

  /** Decode metadata per media row. Image width/height come from REAL
    * `ImageIO` decode of the PNG payload; audio duration / sample rate from
    * REAL `AudioSystem` parsing of the WAV payload (duration = frame count /
    * frame rate, exact at the power-of-two rate). Undecodable bytes yield
    * nulls — the honest failure mode. Video frame count remains a size-based
    * stub (no JVM video codec). One iterator pass per partition, per-partition
    * kernel setup.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition kernel init: no on-disk stream cache, headless raster ops
        ImageIO.setUseCache(false)
        rows.map { case (id, bytes, kind) =>
          val n = if (bytes == null) 0 else bytes.length
          val (w, h) =
            if (kind == "image" && n > 0)
              Option(ImageIO.read(new ByteArrayInputStream(bytes)))
                .map(img => (Option(img.getWidth), Option(img.getHeight)))
                .getOrElse((None, None))
            else (Option.empty[Int], Option.empty[Int])
          val (dur, rate) =
            if (kind == "audio" && n > 0)
              try {
                val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
                try {
                  val f = ais.getFormat
                  (Some(ais.getFrameLength.toDouble / f.getFrameRate.toDouble),
                    Some(f.getSampleRate.toInt))
                } finally ais.close()
              } catch { case _: Exception => (None, None) }
            else (Option.empty[Double], Option.empty[Int])
          val frames = if (kind == "video") Some(n % 24 + 1) else None
          (id, kind, n, w, h, dur, rate, frames)
        }
      }
      .toDF("doc_id", "kind", "n_bytes", "width", "height", "duration_s",
        "sample_rate", "n_frames")
  }

  /** STUB frame sampler for video media: emits every k-th "frame" (byte-slice
    * stand-in). Real impl: mapPartitions + codec; identical shape/partitioning.
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"),
        posexplode(split(base64(col("media")), "(?<=\\G.{32})")).as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % everyK === 0 && length(col("frame")) > 0)

  /** REAL image resize: decode the PNG, scale to fit `maxSide` (never
    * upscale), resample through Graphics2D, re-encode as PNG. Output media
    * round-trips through `decodeMeta` at the new dimensions.
    */
  def resize(media: DataFrame, maxSide: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes, kind) =>
          if (kind != "image" || bytes == null || bytes.isEmpty) None
          else Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
            val scale = math.min(1.0,
              maxSide.toDouble / math.max(img.getWidth, img.getHeight))
            val nw = math.max(1, math.ceil(img.getWidth * scale).toInt)
            val nh = math.max(1, math.ceil(img.getHeight * scale).toInt)
            val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.drawImage(img.getScaledInstance(nw, nh, java.awt.Image.SCALE_SMOOTH),
              0, 0, null)
            g.dispose()
            val buf = new ByteArrayOutputStream()
            ImageIO.write(out, "png", buf)
            (id, nw, nh, buf.toByteArray)
          }
        }
      }
      .toDF("doc_id", "new_width", "new_height", "media")
  }

  /** Partition-parallel feature extraction over the binary column — the
    * mapPartitions kernel contract a real embedding model plugs into: one
    * iterator pass per partition, per-partition kernel setup, fixed-width
    * Array[Float] feature output. The FEATURE FUNCTION IS A DETERMINISTIC
    * STAND-IN (a 16-bin byte histogram, L1-normalized, in place of e.g. a CLIP
    * embedding); schema, batching, and partitioning are the real contract.
    */
  def featureExtract(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition kernel init happens HERE (a real impl loads the model once)
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
