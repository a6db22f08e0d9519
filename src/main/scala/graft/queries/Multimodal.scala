package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaOps, MediaRecord}

/** Multimodal-column queries — binary payloads built from `documents` (the
  * only deterministic byte source in the fixtures; texts are ASCII so byte
  * counts equal `n_chars`, which the oracle exploits).
  */
object Multimodal {

  /** Binary payload → per-partition stub decode → typed features. The stub
    * decode is pure arithmetic on byte length/values, so the DuckDB oracle
    * reproduces it exactly — verifying the full binary-column path: cast to
    * bytes, Dataset[MediaRecord] encoding, mapPartitions batch shape,
    * feature schema. */
  val mm01MediaFeatures = Q(
    "mm01_media_features",
    (s, dir) => {
      import s.implicits._
      val media = MediaOps
        .mediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
        .select(
          col("media_id"), col("payload"), col("meta.format").as("format"))
        .as[MediaRecord]
      MediaOps.extractFeatures(media)
        .toDF()
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, source AS format,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
      CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
      CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
        / octet_length(encode(text)) AS luma
    FROM documents ORDER BY media_id"""))

  /** Frame sampling over the binary payloads: 256-byte frames, max 4 per
    * record. Fixture texts are ASCII, so the oracle reproduces the byte
    * windows as character substrings — frame count, frame sizes, and
    * per-frame mean byte all verified exactly. */
  val mm02FrameSample = Q(
    "mm02_frame_sample",
    (s, dir) => {
      import s.implicits._
      val media = MediaOps
        .mediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
        .select(col("media_id"), col("payload"), col("meta.format").as("format"))
        .as[MediaRecord]
      MediaOps.sampleFrames(media, frameBytes = 256, maxFrames = 4)
        .toDF()
        .withColumn("mean_byte", round(col("mean_byte"), 6))
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH f AS (
      SELECT doc_id AS media_id,
        unnest(generate_series(0,
          CAST(least(ceil(octet_length(encode(text)) / 256.0), 4) AS BIGINT) - 1)) AS frame_idx,
        text
      FROM documents),
    s AS (
      SELECT media_id, frame_idx,
        substring(text, CAST(frame_idx * 256 + 1 AS INT), 256) AS frame
      FROM f)
    SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
      CAST(octet_length(encode(frame)) AS BIGINT) AS n_bytes,
      round(CAST(list_sum(list_transform(string_split(frame, ''), c -> ascii(c))) AS DOUBLE)
        / octet_length(encode(frame)), 6) AS mean_byte
    FROM s ORDER BY media_id, frame_idx"""))

  /** Fit-within resize planning into a 256×256 box: aspect-preserving
    * scale, never upscaled, output buffer sized for RGB. The geometry is
    * pure arithmetic on the stub-decoded dimensions, so the oracle
    * reproduces every output column exactly — pinning the resize operator's
    * full metadata contract while the byte resampling stays a stub
    * ([[graft.multimodal.MediaOps.resize]]). */
  val mm03Resize = Q(
    "mm03_resize",
    (s, dir) => {
      import s.implicits._
      val media = MediaOps
        .mediaFrame(Tables.documents(s, dir), "doc_id", "text", "source")
        .select(col("media_id"), col("payload"), col("meta.format").as("format"))
        .as[MediaRecord]
      MediaOps.resize(media, targetW = 256, targetH = 256)
        .toDF()
        .withColumn("scale", round(col("scale"), 6))
        .orderBy("media_id")
    },
    Some("""WITH d AS (
      SELECT doc_id AS media_id,
        CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
        CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height
      FROM documents),
    r AS (
      SELECT media_id, width, height,
        least(1.0, least(256.0 / width, 256.0 / height)) AS scale
      FROM d)
    SELECT media_id, width, height,
      greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_width,
      greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_height,
      greatest(1, CAST(floor(width * scale) AS BIGINT))
        * greatest(1, CAST(floor(height * scale) AS BIGINT)) * 3 AS out_bytes,
      round(scale, 6) AS scale
    FROM r ORDER BY media_id"""))

  /** The REAL codec path, oracle-gated: each document id becomes an actual
    * PNG (constant-grey `id % 256`, dimensions derived from the id),
    * encoded with the JDK's ImageIO writer inside the distributed map and
    * decoded back through [[graft.multimodal.MediaOps.extractFeatures]]'s
    * format-dispatched REAL decode. Because PNG is lossless and the image
    * is constant-grey, every decoded statistic has a closed form the DuckDB
    * oracle computes relationally: width/height from the id arithmetic and
    * `round(luma) = id % 256` exactly (the per-pixel Rec.601 weights sum to
    * 1 within 1 ulp; rounding absorbs it). A decoder that mis-read
    * dimensions, dropped rows, or mangled pixel values hash-mismatches.
    *
    * Scale: payload generation + decode are one mapPartitions pass over
    * the id rows; the only shuffle moves the 8-byte ids (to spread codec
    * CPU across cores — the fixture is one parquet file, i.e. one scan
    * task), and the binary never leaves the partition it is built in. */
  val mm04RealPngDecode = Q(
    "mm04_real_png_decode",
    (s, dir) => {
      import s.implicits._
      // The documents fixture is one small parquet file -> ONE scan task,
      // which would run every ImageIO encode+decode single-threaded (the
      // classic unsplittable-input shape, guide §2.5). Spread the id rows
      // across the session's parallelism before the codec map; the final
      // orderBy fixes the output order, so results are unchanged.
      val media = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .map { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + id % 16).toInt
          val grey = (id % 256).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val rgb = (grey << 16) | (grey << 8) | grey
          var y = 0
          while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, bos.toByteArray, "png")
        }
      MediaOps.extractFeatures(media)
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("luma")).cast("long").as("grey"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CAST(16 + doc_id % 32 AS INT) AS width,
      CAST(16 + doc_id % 16 AS INT) AS height,
      doc_id % 256 AS grey
    FROM documents ORDER BY media_id"""))

  /** The REAL audio path, oracle-gated (mm04's pattern for sound): each
    * document id becomes an actual 16-bit PCM WAV (JDK `AudioSystem`
    * writer, mono, 8 kHz, constant amplitude `id % 1000`, `64 + id % 64`
    * frames) and is decoded back through
    * [[graft.multimodal.MediaOps.extractAudioFeatures]]. Constant samples
    * make the RMS integer-exact (`sqrt` of an exactly-representable
    * perfect square), so every decoded field — rate, channels, frame
    * count, RMS — has a closed form the DuckDB oracle computes
    * relationally. Compressed audio (MP3/AAC) has no bundled JDK codec and
    * stays on the documented stand-in path. */
  val mm05RealWavDecode = Q(
    "mm05_real_wav_decode",
    (s, dir) => {
      import s.implicits._
      // NOT parallelized like mm04: javax.sound's AudioSystem provider
      // registry synchronizes writers, so 32 concurrent tasks contend and
      // run ~4x SLOWER than the single-task WAV encode (measured 0.8 s
      // single-task vs 3.1 s repartitioned at sf0.1) — the uncompressed
      // WAV codec is cheap enough that one task wins.
      val media = Tables.documents(s, dir)
        .select(col("doc_id").cast("long")).as[Long]
        .map { id =>
          val nFrames = (64 + id % 64).toInt
          val amp = (id % 1000).toInt
          val pcm = new Array[Byte](nFrames * 2)
          var i = 0
          while (i < nFrames) {
            pcm(2 * i) = (amp & 0xff).toByte
            pcm(2 * i + 1) = ((amp >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRecord(id, bos.toByteArray, "wav")
        }
      MediaOps.extractAudioFeatures(media)
        .toDF()
        .select(col("media_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels"), col("n_frames"),
          col("rms").cast("long").as("rms"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
      CAST(8000 AS BIGINT) AS sample_rate,
      CAST(1 AS INT) AS channels,
      CAST(64 + doc_id % 64 AS BIGINT) AS n_frames,
      doc_id % 1000 AS rms
    FROM documents ORDER BY media_id"""))

  val all: Seq[Q] = Seq(mm01MediaFeatures, mm02FrameSample, mm03Resize,
    mm04RealPngDecode, mm05RealWavDecode)
}
