package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The REAL image path: JDK ImageIO decode of PNG/JPEG/BMP bytes through
  * the distributed operators — exact dimensions, exact luma on lossless
  * formats, aspect-preserving resample producing an actual pixel buffer —
  * and the format dispatch that routes non-images to the stand-in.
  */
class MediaOpsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A 64×48 horizontal gradient: pixel (x, y) = grey level 4x. */
  private def gradient(): BufferedImage = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    (0 until 48).foreach { y =>
      (0 until 64).foreach { x =>
        val g = (x * 4) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
    }
    img
  }

  private def encode(fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(gradient(), fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  // Grey gradient: luma weights sum to 1, so mean luma = mean grey = mean of
  // 4x over x in [0,64) = 4 * 31.5 = 126.0 exactly.
  private val expectedLuma = 126.0

  test("PNG / BMP decode exactly; JPEG within lossy tolerance — through the " +
    "distributed extractFeatures operator") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, encode("png"), "png"),
      MediaRecord(2L, encode("bmp"), "bmp"),
      MediaRecord(3L, encode("jpg"), "jpeg")).toDS()
    val got = MediaOps.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    got.values.foreach { f =>
      assert(f.width === 64 && f.height === 48, s"${f.format}: ${f.width}x${f.height}")
    }
    assert(got(1L).luma === expectedLuma, "png luma must be exact")
    assert(got(2L).luma === expectedLuma, "bmp luma must be exact")
    assert(math.abs(got(3L).luma - expectedLuma) < 2.0,
      s"jpeg luma ${got(3L).luma} drifted beyond lossy tolerance")
  }

  test("non-image formats dispatch to the deterministic stand-in") {
    import spark.implicits._
    val bytes = Array.tabulate[Byte](100)(i => i.toByte)
    val media = Seq(MediaRecord(9L, bytes, "wav")).toDS()
    val f = MediaOps.extractFeatures(media).collect().head
    val (w, h, luma) = MediaOps.decodeStub(bytes)
    assert((f.width, f.height, f.luma) === ((w, h, luma)))
  }

  test("malformed image bytes fall back instead of failing the partition") {
    import spark.implicits._
    val junk = Array.fill[Byte](64)(0x7f)
    val media = Seq(MediaRecord(5L, junk, "png")).toDS()
    val f = MediaOps.extractFeatures(media).collect().head
    assert(f.width === MediaOps.decodeStub(junk)._1)
  }

  test("WAV decode is real: header fields exact, sine RMS = amp/sqrt(2)") {
    import spark.implicits._
    val rate = 8000f
    val n = 8000
    val amp = 10000.0
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = math.round(amp * math.sin(2 * math.Pi * 440 * i / rate)).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)

    val media = Seq(
      MediaRecord(1L, bos.toByteArray, "wav"),
      MediaRecord(2L, bos.toByteArray, "mp3")). // same bytes, non-JDK format
      toDS()
    val got = MediaOps.extractAudioFeatures(media).collect()
      .map(a => a.media_id -> a).toMap
    val wav = got(1L)
    assert(wav.sample_rate === 8000.0 && wav.channels === 1 && wav.n_frames === n.toLong)
    assert(math.abs(wav.rms - amp / math.sqrt(2)) < amp * 0.01,
      s"sine RMS ${wav.rms} should be ~${amp / math.sqrt(2)}")
    // Formats without a bundled JDK codec never claim to have decoded.
    assert(got(2L).sample_rate === 0.0 && got(2L).n_frames === 0L)
  }

  test("resize plans real dimensions for images and resample emits pixels") {
    import spark.implicits._
    val media = Seq(MediaRecord(1L, encode("png"), "png")).toDS()
    val r = MediaOps.resize(media, targetW = 32, targetH = 32).collect().head
    // Fit 64x48 into 32x32: scale = 0.5, out 32x24.
    assert(r.width === 64 && r.height === 48)
    assert(r.out_width === 32 && r.out_height === 24 && r.scale === 0.5)
    assert(r.out_bytes === 32L * 24L * 3L)

    val buf = MediaOps.resampleImage(encode("png"), 32, 32)
    assert(buf.exists(_.length === 32 * 24 * 3), "resample must emit a real raster")
    // Bilinear mean of a linear gradient stays near the source mean.
    val mean = buf.get.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / buf.get.length
    assert(math.abs(mean - expectedLuma) < 3.0, s"resampled mean $mean")
  }
}
