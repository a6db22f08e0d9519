package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload plus typed metadata.
  * Top-level case classes so Spark derives product Encoders. */
final case class MediaRecord(media_id: Long, payload: Array[Byte], format: String)

final case class MediaFeatures(
    media_id: Long, format: String, n_bytes: Long,
    width: Int, height: Int, luma: Double)

final case class FrameFeatures(
    media_id: Long, frame_idx: Int, n_bytes: Long, mean_byte: Double)

final case class AudioFeatures(
    media_id: Long, format: String, n_bytes: Long,
    sample_rate: Double, channels: Int, n_frames: Long, rms: Double)

final case class ResizedMedia(
    media_id: Long, width: Int, height: Int,
    out_width: Long, out_height: Long, out_bytes: Long, scale: Double)

/** Multimodal-column plumbing — SURVEY.md §2.12.
  *
  * Images/audio/video ride Spark as opaque `BinaryType` payload columns next
  * to a typed metadata struct; decode/feature-extraction runs as a
  * batch-per-partition operator (`mapPartitions`) so a real decoder can
  * amortize library initialization per partition rather than per row.
  *
  * Decode is format-dispatched ([[MediaOps.decode]]): IMAGE formats decode
  * for real through the JDK's bundled `ImageIO` readers (PNG/JPEG/BMP/GIF/
  * WBMP/TIFF — actual pixel dimensions, Rec.601 mean luma, and a real
  * Java2D bilinear resample in [[MediaOps.resampleImage]], no external
  * library). AUDIO/VIDEO formats have no bundled JDK codec, so they fall
  * through to a clearly-marked deterministic stand-in
  * ([[MediaOps.decodeStub]]) behind the same batch shape. Schema, encoders,
  * partitioning, and the per-partition batch shape are identical on both
  * paths and oracle-/sbt-tested.
  *
  * Scale posture: payloads never shuffle for feature extraction (narrow
  * mapPartitions over the scan); downstream analytics select only the
  * metadata/feature columns, so column pruning keeps the binary out of every
  * later stage.
  */
object MediaOps {

  /** Assemble a media frame: id + binary payload + metadata struct. */
  def mediaFrame(df: DataFrame, idCol: String, payloadCol: String, formatCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        col(formatCol).as("format"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Formats the REAL decoder handles: the image formats the JDK's bundled
    * `ImageIO` readers decode without any external library (PNG, JPEG, BMP,
    * GIF, WBMP, TIFF since JDK 9). Decode is dispatched on the record's
    * declared format — exactly the production pattern — so payloads whose
    * format is NOT an image (audio/video containers, or the fixtures'
    * document sources) fall through to the deterministic stand-in. */
  val ImageFormats: Set[String] = Set("png", "jpg", "jpeg", "bmp", "gif", "wbmp", "tiff", "tif")

  /** REAL image decode via the JDK's ImageIO: actual pixel dimensions and
    * the mean Rec.601 luma over all pixels. Returns None when no bundled
    * reader claims the bytes (or they are malformed) — callers fall back to
    * the deterministic stand-in, never fail the partition. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
              0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum / (w.toLong * h)))
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Format-dispatched decode: real ImageIO for declared image formats,
    * deterministic stand-in otherwise (audio/video codecs are not bundled
    * with the JDK; their plumbing — batch shape, schema, fan-out caps — is
    * identical and tested). */
  def decode(format: String, bytes: Array[Byte]): (Int, Int, Double) =
    if (format != null && ImageFormats(format.toLowerCase(java.util.Locale.ROOT)))
      decodeImage(bytes).getOrElse(decodeStub(bytes))
    else decodeStub(bytes)

  /** Formats the JDK's bundled `javax.sound.sampled` readers decode without
    * external libraries: WAV, AIFF, AU. (Compressed audio — MP3/AAC/OGG —
    * has no bundled JDK codec and stays on the stand-in path.) */
  val AudioFormats: Set[String] = Set("wav", "wave", "aiff", "aif", "au", "snd")

  /** REAL audio decode via the JDK: container header (sample rate,
    * channels, frame count) plus the RMS amplitude of the 16-bit PCM
    * samples — the amplitude statistic an audio curation pipeline filters
    * on (silence/clipping detection). None when no bundled reader claims
    * the bytes or the encoding is not 16-bit PCM. */
  def decodeAudio(bytes: Array[Byte]): Option[(Double, Int, Long, Double)] =
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val lo = data(2 * i) & 0xff
            val hi = data(2 * i + 1)
            val s = if (fmt.isBigEndian) ((data(2 * i) << 8) | (data(2 * i + 1) & 0xff))
                    else ((hi << 8) | lo)
            sumSq += s.toDouble * s
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          Some((fmt.getSampleRate.toDouble, fmt.getChannels, ais.getFrameLength, rms))
        }
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException | _: RuntimeException => None
    }

  /** Per-partition REAL audio feature extraction (format-dispatched like
    * [[extractFeatures]]): non-audio or undecodable records get zeroed
    * audio fields rather than failing the partition. */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val decoded =
          if (r.format != null &&
              AudioFormats(r.format.toLowerCase(java.util.Locale.ROOT)))
            decodeAudio(r.payload)
          else None
        decoded match {
          case Some((rate, ch, frames, rms)) =>
            AudioFeatures(r.media_id, r.format, r.payload.length.toLong,
              rate, ch, frames, rms)
          case None =>
            AudioFeatures(r.media_id, r.format, r.payload.length.toLong,
              0.0, 0, 0L, 0.0)
        }
      }
    }
  }

  /** Deterministic stand-in for NON-image media (no bundled JDK codec):
    * fabricates dimensions from the byte length and "luma" as the mean byte
    * value. Image formats never reach this unless their bytes are malformed.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val w = bytes.length % 640 + 16
    val h = bytes.length % 480 + 16
    // Mean byte value, summed in Long for an order-independent exact result.
    val luma =
      if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length
    (w, h, luma)
  }

  /** Frame sampling — the video/audio pipeline step that explodes one
    * payload into per-frame rows (1:N flatMap inside mapPartitions, so a
    * real demuxer initializes once per partition and streams). Frames here
    * are fixed-stride byte windows of the payload (STUB standing in for
    * keyframe extraction), capped at `maxFrames` per record — the cap is
    * what keeps the fan-out bounded at 100 TB, and it is part of the
    * operator's contract, not a test shortcut.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
      maxFrames: Int): Dataset[FrameFeatures] = {
    require(frameBytes > 0 && maxFrames > 0, "frameBytes and maxFrames must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        // Ceil-division in Long: (len + frameBytes - 1) wraps negative in
        // Int for ~2 GB payloads (the records frame sampling exists for),
        // which would silently emit zero frames.
        val n = math.min(
          (r.payload.length.toLong + frameBytes - 1) / frameBytes, maxFrames.toLong).toInt
        (0 until n).iterator.map { i =>
          val from = i * frameBytes
          val until = math.min(from + frameBytes, r.payload.length)
          var sum = 0L
          var j = from
          while (j < until) { sum += (r.payload(j) & 0xff); j += 1 }
          FrameFeatures(r.media_id, i, (until - from).toLong,
            if (until == from) 0.0 else sum.toDouble / (until - from))
        }
      }
    }
  }

  /** Fit-within resize planning — the image/video preprocessing step between
    * decode and feature extraction. The geometry is real (aspect-preserving
    * scale into a target box, never upscaled); producing the resampled
    * bytes is the clearly-marked stub part (out_bytes is the RGB buffer
    * size a real resampler would emit). Same mapPartitions batch shape as
    * [[extractFeatures]]: a real scaler (libswscale, AWT) initializes once
    * per partition and streams through it; payloads never shuffle. */
  def resize(media: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (heavier resampler state would be initialized here, once per partition)
      it.map { r =>
        val (w, h, _) = decode(r.format, r.payload)
        val scale = math.min(1.0, math.min(targetW.toDouble / w, targetH.toDouble / h))
        val outW = math.max(1L, math.floor(w * scale).toLong)
        val outH = math.max(1L, math.floor(h * scale).toLong)
        ResizedMedia(r.media_id, w, h, outW, outH, outW * outH * 3L, scale)
      }
    }
  }

  /** REAL resample of a decodable image into the fit-within box: Java2D
    * bilinear draw into a 3-byte-BGR raster (pure JDK). Returns the actual
    * resampled buffer — proof the resize path produces pixels, not just
    * geometry — or None for non-images. */
  def resampleImage(bytes: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val scale = math.min(1.0,
          math.min(targetW.toDouble / img.getWidth, targetH.toDouble / img.getHeight))
        val ow = math.max(1, math.floor(img.getWidth * scale).toInt)
        val oh = math.max(1, math.floor(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, ow, oh, null)
        } finally g.dispose()
        Some(out.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData)
      }
    } catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Per-partition batch decode: the iterator is the batch, so a real codec
    * would be initialized once here and stream through the partition. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // (heavier codec state would be initialized here, once per partition)
      it.map { r =>
        val (w, h, luma) = decode(r.format, r.payload)
        MediaFeatures(r.media_id, r.format, r.payload.length.toLong, w, h, luma)
      }
    }
  }
}
