package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media ride as opaque `binary` columns plus a typed metadata
  * struct; decode/feature steps run partition-parallel over the bytes.
  *
  * Decode is REAL for images and audio using pure-JDK codecs — no
  * external dependencies: `javax.imageio` (PNG/JPEG/GIF/BMP → dims +
  * stride-sampled luminance, plus bilinear [[resizeImage]]) and
  * `javax.sound.sampled` (WAV/AIFF/AU → duration/rate/channels/RMS over
  * streamed 16-bit PCM). Video has no JDK codec and falls back to
  * byte-stat features ([[decodeStub]], kind="opaque") — swap in a real
  * codec there and the pipeline shape stays put. The Spark side follows
  * the `mapInPandas` pattern: one iterator per partition, codec state
  * initialized once per partition (never per row), and metadata
  * predicates prune before any byte is touched.
  */
object Multimodal {

  /** Typed metadata carried next to the payload bytes. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  final case class MediaRow(media_id: Long, payload: Array[Byte],
      mime: String, width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, n_bytes: Long,
      sha_like: String, brightness: Double, frames_sampled: Int)

  /** Deterministic fake "decode": byte statistics standing in for pixel
    * decoding. Replace the body with a real codec (e.g. TwelveMonkeys /
    * javacv) when the runtime has one — the pipeline shape stays put. */
  def decodeStub(payload: Array[Byte]): (Double, Int) = {
    if (payload == null || payload.isEmpty) (0.0, 0)
    else {
      var s = 0L
      var i = 0
      while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
      (s.toDouble / payload.length / 255.0, math.max(1, payload.length / 64))
    }
  }

  /** Feature extraction over the binary column: one codec instance per
    * partition (the expensive-init pattern of `mapInPandas`), streaming
    * rows through it. Narrow transformation — no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (once, not per row)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (brightness, frames) = decodeStub(r.payload)
        digest.reset()
        val h = digest.digest(if (r.payload == null) Array.emptyByteArray else r.payload)
        MediaFeatures(r.media_id, if (r.payload == null) 0L else r.payload.length.toLong,
          h.map("%02x".format(_)).mkString, brightness, frames)
      }
    }
  }

  /** Column-only byte metadata (no decode): length + content hash +
    * deterministic sample offsets — prunable, codegen'd, oracle-friendly. */
  def byteMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"),
      md5(col(payloadCol)).as("content_md5"))

  // ---- real decode (pure-JVM codecs, no external deps) ------------------

  /** One decoded row per media item. `kind` is what actually decoded:
    * "image" (javax.imageio: PNG/JPEG/GIF/BMP), "audio"
    * (javax.sound.sampled: WAV/AIFF/AU), or "opaque" (undecodable —
    * byte-stat fallback features only). Video has no JDK codec and lands
    * in "opaque"; the pipeline shape is identical when a codec is added. */
  final case class DecodedMedia(media_id: Long, kind: String,
      width: Int, height: Int, brightness: Double,
      duration_ms: Long, sample_rate: Int, channels: Int, rms: Double)

  /** Image decode: (width, height, mean luminance in [0,1]). Luminance is
    * Rec.601 over an at-most-256×256 pixel stride sample, so cost is
    * bounded per image regardless of resolution. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double)] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val (sx, sy) = (math.max(1, w / 256), math.max(1, h / 256))
      var sum = 0.0; var n = 0L; var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          n += 1; x += sx
        }
        y += sy
      }
      Some((w, h, if (n == 0) 0.0 else sum / n / 255.0))
    }
  }

  /** Audio decode: (duration_ms, sample_rate, channels, rms in [0,1]).
    * RMS is computed over 16-bit PCM frames (the decoded stream is asked
    * for PCM_SIGNED 16-bit); frames stream through a fixed buffer. */
  def decodeAudio(payload: Array[Byte]): Option[(Long, Int, Int, Double)] = {
    if (payload == null || payload.isEmpty) return None
    import javax.sound.sampled._
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          fmt.getSampleRate, 16, fmt.getChannels,
          2 * fmt.getChannels, fmt.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
        val nFrames = in.getFrameLength
        val durationMs =
          if (nFrames >= 0) (nFrames * 1000.0 / fmt.getFrameRate).toLong else -1L
        val buf = new Array[Byte](8192)
        var sumSq = 0.0; var n = 0L
        var read = pcm.read(buf)
        while (read > 0) {
          var i = 0
          while (i + 1 < read) {
            val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort / 32768.0
            sumSq += s * s; n += 1; i += 2
          }
          read = pcm.read(buf)
        }
        Some((durationMs, fmt.getSampleRate.toInt, fmt.getChannels,
          if (n == 0) 0.0 else math.sqrt(sumSq / n)))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Resize an image to fit within `maxDim` (aspect preserved), re-encoded
    * as PNG. Undecodable payloads return None. */
  def resizeImage(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    }
  }

  /** One sampled video frame: geometry, presentation timestamp, and the
    * per-frame features (integer-e4 brightness + content digest — both
    * engine-independent). */
  final case class SampledFrame(media_id: Long, frame_idx: Int,
      pts_ms: Long, width: Int, height: Int, brightness_e4: Long,
      frame_md5: String)

  /** Frame-sample a video binary column: emit every `everyNth` frame
    * with its features, never touching the frames in between.
    *
    * The "demuxer" is the deterministic stand-in the JDK forces (no
    * video codec ships with it): the payload is raw grayscale video —
    * frames of `width·height` bytes back to back, a trailing partial
    * frame dropped (ffmpeg's `rawvideo` shape, geometry supplied
    * out-of-band). A real container parser swaps into the offset
    * computation and the signature, schema, and partitioning stay put.
    *
    * The property that matters at 100 TB is that sampling SEEKS:
    * unsampled frames are skipped by offset arithmetic, not decoded and
    * discarded — an hour of video sampled at one frame per minute costs
    * 60 frame reads, not 108 000 decodes. Narrow flatMap (no shuffle);
    * digest state initialized once per partition; one output row per
    * SAMPLED frame, so the operator's output is frames/everyNth rows
    * regardless of payload size. */
  def frameSample(media: Dataset[MediaRow], width: Int, height: Int,
      everyNth: Int, fps: Int): Dataset[SampledFrame] = {
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(everyNth >= 1, s"everyNth $everyNth must be >= 1")
    require(fps > 0, s"fps $fps must be > 0")
    import media.sparkSession.implicits._
    val frameBytes = width * height
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5") // per partition
      it.flatMap { r =>
        val p = if (r.payload == null) Array.emptyByteArray else r.payload
        val nFrames = p.length / frameBytes
        Iterator.range(0, nFrames, everyNth).map { i =>
          val off = i * frameBytes // seek: untouched frames are never read
          var s = 0L
          var j = off
          while (j < off + frameBytes) { s += (p(j) & 0xff); j += 1 }
          digest.reset()
          val h = digest.digest(java.util.Arrays.copyOfRange(p, off, off + frameBytes))
          SampledFrame(r.media_id, i, i.toLong * 1000 / fps, width, height,
            s * 10000 / (frameBytes.toLong * 255),
            h.map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** The real decode pipeline: per-partition codec setup once (ImageIO
    * cache off — no temp files on executors), then rows stream through
    * image → audio → opaque fallback. Narrow transformation, no shuffle;
    * decode cost is bounded per row (stride-sampled pixels, streamed PCM),
    * so partition skew only tracks payload size — at 100 TB pair this with
    * `repartition` on a size bucket if payloads are wildly uneven. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // once per partition
      it.map { r =>
        decodeImage(r.payload) match {
          case Some((w, h, bright)) =>
            DecodedMedia(r.media_id, "image", w, h, bright, -1L, 0, 0, 0.0)
          case None => decodeAudio(r.payload) match {
            case Some((durMs, rate, ch, rms)) =>
              DecodedMedia(r.media_id, "audio", 0, 0, 0.0, durMs, rate, ch, rms)
            case None =>
              val (bright, _) = decodeStub(r.payload)
              DecodedMedia(r.media_id, "opaque", 0, 0, bright, -1L, 0, 0, 0.0)
          }
        }
      }
    }
  }
}
