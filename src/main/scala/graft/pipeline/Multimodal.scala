package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, batch iteration, partition sizing — is real and tested. Image
  * decode is REAL behind `spark.graft.media.decoder=imageio` (JDK
  * `javax.imageio`: PNG/JPEG/GIF/BMP); the default [[StubDecoder]] is a
  * deterministic fake (oracle-checkable, and the fallback for formats the
  * JDK can't read — video/audio codecs don't exist in this environment).
  *
  * Scale notes: payloads are processed with `mapPartitions` over an
  * Iterator (streaming, batch-shaped like `mapInPandas` batches — no
  * whole-partition materialization), metadata-only queries never touch
  * the payload bytes thanks to parquet column pruning, and
  * `spark.sql.files.maxPartitionBytes` governs scan granularity for
  * fat binary columns.
  */
object Multimodal {

  /** A decoded media record: what a real decoder would emit. */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      feature_hash: Long)

  /** Deterministic fake decode: dimensions derived from the payload hash.
    * The FALLBACK for codecs outside this environment (ffmpeg-class
    * compressed video/audio); the real decoders are [[ImageIODecoder]]
    * (PNG/JPEG/GIF/BMP), [[audioFeatures]] (RIFF/WAVE PCM), and
    * [[videoDecodeFeatures]] (RIFF/AVI + uncompressed BI_RGB DIB frame
    * decode) — signature stays `Array[Byte] => (width, height, channels)`. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val h = Hashing.hash60Local(new String(payload.take(32), "ISO-8859-1"))
      (((h % 1024) + 1).toInt, (((h >> 10) % 1024) + 1).toInt, 3)
    }
  }

  /** Real image decode on the JDK's built-in codecs (PNG/JPEG/GIF/BMP via
    * `javax.imageio` — zero extra dependencies). Non-image payloads (and
    * the synthetic UTF-8 testdata payloads) fall back to [[StubDecoder]],
    * so a mixed corpus decodes what it can and stays total. ImageIO
    * readers are NOT thread-safe to share, but each call creates its own
    * stream/reader, so concurrent tasks are fine. */
  object ImageIODecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int) =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) StubDecoder.decode(payload) // unrecognized format
        else (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
      } catch { case _: Exception => StubDecoder.decode(payload) }
  }

  /** Decoder selection — `spark.graft.media.decoder` = `stub` (default;
    * deterministic, oracle-checkable) or `imageio` (real JDK codecs with
    * stub fallback for undecodable bytes). The conf is read ON THE DRIVER
    * at plan time and the chosen function closure ships with the task —
    * executors never consult the conf. */
  def decoderFor(spark: SparkSession): Array[Byte] => (Int, Int, Int) =
    spark.conf.getOption("spark.graft.media.decoder").getOrElse("stub") match {
      case "imageio" => ImageIODecoder.decode
      case _ => StubDecoder.decode
    }

  /** Attach a synthetic binary payload column to a text table — the
    * testdata stand-in for real media bytes. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Typed mapPartitions decode pass (the mapInPandas-batch analogue):
    * streams the partition iterator, emits typed features. */
  def extractFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] =
    extractFeaturesFromPayload(spark, withPayload(docs))

  /** Decode pass over an existing `(doc_id, payload: binary)` frame —
    * the entry point when the corpus already carries real media bytes
    * (the docs path above synthesizes payloads from text). */
  def extractFeaturesFromPayload(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val decode = decoderFor(spark)
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (w, h, c) = decode(payload)
          MediaFeatures(id, payload.length.toLong, w, h, c,
            Hashing.hash60Local(new String(payload, "ISO-8859-1")))
        }
      }
  }

  /** A decoded audio record. `peak_amp` is the max |sample| over the
    * PCM stream — the loudness stat a filtering pipeline thresholds on. */
  final case class AudioFeatures(
      doc_id: Long,
      byte_len: Long,
      sample_rate: Int,
      n_channels: Int,
      n_samples: Long,
      peak_amp: Int)

  /** Deterministic 16-bit mono PCM WAV synthesized per doc — a REAL
    * RIFF/WAVE container written by `javax.sound.sampled`, so the decode
    * below exercises genuine container parsing. Square wave: n =
    * 64 + id%192 samples at 8 kHz, amplitude 1000 + id%9000 — every
    * decoded stat is a closed-form function of doc_id, which is what
    * lets DuckDB oracle-check a binary round-trip it cannot parse. */
  def synthWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = (64 + docId % 192).toInt
    val amp = (1000 + docId % 9000).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = if (i % 2 == 0) amp else -amp
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Attach a synthetic WAV payload column (the audio twin of
    * [[withPayload]]). Payload synthesis is a typed map — imperative
    * byte assembly has no columnar form. */
  def withWavPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthWav(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL audio decode on the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM — zero extra dependencies): parses the container header for
    * format metadata, then streams the PCM frames for sample count and
    * peak amplitude. Same mapPartitions batch shape as the image path. */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          val fmt = ais.getFormat
          val bytesPerFrame = fmt.getFrameSize
          val buf = new Array[Byte](4096)
          var nSamples = 0L
          var peak = 0
          var read = ais.read(buf)
          while (read > 0) {
            var off = 0
            while (off + 1 < read) {
              val s = ((buf(off + 1) << 8) | (buf(off) & 0xff)).toShort.toInt
              if (math.abs(s) > peak) peak = math.abs(s)
              off += bytesPerFrame
              nSamples += 1
            }
            read = ais.read(buf)
          }
          ais.close()
          AudioFeatures(id, payload.length.toLong,
            fmt.getSampleRate.toInt, fmt.getChannels, nSamples, peak)
        }
      }
  }

  final case class VideoFeatures(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Long,
      frames_seen: Long,
      us_per_frame: Long)

  /** Deterministic minimal-but-VALID AVI (RIFF) container per doc —
    * RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf('vids'/BI
    * header))) LIST('movi' n × '00db' frames)) with every u32
    * little-endian per the public AVI/RIFF layout. Closed-form params:
    * width = 16+id%64, height = 16+id%48, frames = 4+id%12 of 16 bytes
    * each, 33333 µs/frame — so total bytes = 224 + 24·frames and every
    * parsed field is a function of doc_id the DuckDB oracle states
    * directly. Frame DECODE (codec) remains out of environment scope;
    * the CONTAINER layer — what a 100 TB video corpus's metadata
    * pipeline actually reads — is real on both sides. */
  def synthAvi(docId: Long): Array[Byte] = {
    val width = (16 + docId % 64).toInt
    val height = (16 + docId % 48).toInt
    val nFrames = (4 + docId % 12).toInt
    val usPerFrame = 33333
    val bb = java.nio.ByteBuffer.allocate(224 + 24 * nFrames)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(216 + 24 * nFrames); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame)        // dwMicroSecPerFrame
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(nFrames)           // dwTotalFrames
    bb.putInt(0)
    bb.putInt(1)                 // dwStreams
    bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    (0 until 4).foreach(_ => bb.putInt(0)) // dwReserved
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(usPerFrame)        // dwScale
    bb.putInt(1000000)           // dwRate (rate/scale = fps)
    bb.putInt(0)                 // dwStart
    bb.putInt(nFrames)           // dwLength
    // dwSuggestedBufferSize, dwQuality, dwSampleSize, rcFrame (2 u32)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40)                // biSize
    bb.putInt(width); bb.putInt(height)
    bb.putShort(1.toShort); bb.putShort(24.toShort)
    bb.putInt(0)                 // BI_RGB
    bb.putInt(width * height * 3)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(4 + 24 * nFrames); fourcc("movi")
    (0 until nFrames).foreach { f =>
      fourcc("00db"); bb.putInt(16)
      val h = Hashing.hash60Local(s"$docId|$f")
      (0 until 2).foreach(k => bb.putLong(h + k))
    }
    bb.array()
  }

  /** Deterministic RGB PNG synthesized per doc through the JDK's own
    * encoder (`javax.imageio` — a REAL zlib-compressed PNG, not a fake
    * container): w = 8 + id%16, h = 4 + id%8, and every pixel of row y
    * is (r,g,b) = ((3·id+2·y)%256, (2·id+y)%256, (id+y)%256) —
    * row-constant, so the per-channel sums the decoder must recover are
    * closed-form over (doc_id, y) and a DuckDB oracle that cannot parse
    * PNG states them exactly. */
  def synthPng(docId: Long): Array[Byte] = {
    val w = (8 + docId % 16).toInt
    val h = (4 + docId % 8).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      val r = ((3 * docId + 2 * y) % 256).toInt
      val g = ((2 * docId + y) % 256).toInt
      val b = ((docId + y) % 256).toInt
      val rgb = (r << 16) | (g << 8) | b
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Attach a synthetic PNG payload column (the image twin of
    * [[withAviPayload]]). */
  def withPngPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthPng(id))))
      .toDF("doc_id", "payload")
  }

  /** A REAL-pixel PNG decode record: dimensions, channel count, and
    * per-channel pixel sums plus the row-weighted red checksum a
    * flipped or permuted row map cannot fake. */
  final case class PngDecode(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_px: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      ysum_r: Long)

  /** REAL image decode through the gate (r11 Missing #4 retired for the
    * image path): decompresses genuine PNG bytes via `javax.imageio`
    * and folds the raster into per-channel sums. Refuses to run unless
    * `spark.graft.media.decoder=imageio` is active — this operator IS
    * the real-codec path, a stub here would be a lie — and cross-checks
    * the raster dimensions against [[ImageIODecoder.decode]] (the
    * metadata face the rest of the engine uses) so the two decode
    * surfaces can never drift apart. Undecodable bytes fail loudly with
    * the doc id; PNG is a JDK-guaranteed codec. */
  def pngDecodeFeatures(spark: SparkSession,
      media: DataFrame): Dataset[PngDecode] = {
    import spark.implicits._
    require(spark.conf.getOption("spark.graft.media.decoder")
        .contains("imageio"),
      "pngDecodeFeatures decodes REAL pixels; set " +
        "spark.graft.media.decoder=imageio")
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable PNG payload for doc $id")
        val (mw, mh, mc) = ImageIODecoder.decode(payload)
        require(mw == img.getWidth && mh == img.getHeight &&
            mc == img.getColorModel.getNumComponents,
          s"metadata/raster decode drift for doc $id")
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L; var ysr = 0L
        var y = 0
        while (y < h) {
          var rowR = 0L
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            sr += (px >> 16) & 0xff
            sg += (px >> 8) & 0xff
            sb += px & 0xff
            rowR += (px >> 16) & 0xff
            x += 1
          }
          ysr += (y + 1).toLong * rowR
          y += 1
        }
        PngDecode(id, w, h, mc, w.toLong * h, sr, sg, sb, ysr)
      })
  }

  /** Synthetic JPEG payload — the SAME pixel law as [[synthPng]],
    * pushed through the JDK's LOSSY JPEG writer. Geometry (width,
    * height, channel count) survives the lossy round-trip exactly —
    * that is what the gate states in closed form ([[jpegMetaFeatures]])
    * — while pixel sums only hold within an envelope (MultimodalSpec
    * bounds the per-pixel deviation; a closed-form oracle cannot gate
    * lossy pixels). */
  def synthJpeg(docId: Long): Array[Byte] = {
    val w = (8 + docId % 16).toInt
    val h = (4 + docId % 8).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      val r = ((3 * docId + 2 * y) % 256).toInt
      val g = ((2 * docId + y) % 256).toInt
      val b = ((docId + y) % 256).toInt
      val rgb = (r << 16) | (g << 8) | b
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Attach a synthetic JPEG payload column (the lossy-image twin of
    * [[withPngPayload]]). */
  def withJpegPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthJpeg(id))))
      .toDF("doc_id", "payload")
  }

  /** Geometry record of a REAL JPEG decode — the exact face of the
    * lossy codec. */
  final case class JpegMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_px: Long)

  /** REAL JPEG decode through the gate, exact half: decompresses
    * genuine JFIF bytes via `javax.imageio` and emits the geometry —
    * dimensions and channel count survive the lossy codec exactly, so
    * a closed-form oracle CAN state them (the pixel half is spec-bound
    * with an envelope instead: JPEG is lossy and an exact pixel oracle
    * would be a lie). Same guard rails as [[pngDecodeFeatures]]:
    * refuses to run without `spark.graft.media.decoder=imageio`, and
    * cross-checks the raster against [[ImageIODecoder.decode]] so the
    * two decode surfaces never drift. */
  def jpegMetaFeatures(spark: SparkSession,
      media: DataFrame): Dataset[JpegMeta] = {
    import spark.implicits._
    require(spark.conf.getOption("spark.graft.media.decoder")
        .contains("imageio"),
      "jpegMetaFeatures decodes REAL bytes; set " +
        "spark.graft.media.decoder=imageio")
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        require(img != null, s"undecodable JPEG payload for doc $id")
        val (mw, mh, mc) = ImageIODecoder.decode(payload)
        require(mw == img.getWidth && mh == img.getHeight &&
            mc == img.getColorModel.getNumComponents,
          s"metadata/raster decode drift for doc $id")
        JpegMeta(id, img.getWidth, img.getHeight, mc,
          img.getWidth.toLong * img.getHeight)
      })
  }

  /** Attach a synthetic AVI payload column (the video twin of
    * [[withWavPayload]]). */
  def withAviPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthAvi(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL RIFF/AVI container parsing, pure JVM: verifies the RIFF/'AVI '
    * magic, walks the chunk tree to the 'avih' main header for
    * width/height/frame-count/µs-per-frame, and independently counts
    * the '00db' frame chunks inside 'movi' — `frames_seen` must equal
    * the header's `n_frames` on a well-formed file, so the gate checks
    * the two parsing paths against each other AND the oracle. */
  def aviMetadata(payload: Array[Byte]): VideoFeatures = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt // riff size
    require(fourcc() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var nFrames = 0L; var usPerFrame = 0L
    var framesSeen = 0L
    def walk(end: Int): Unit =
      while (bb.position() < end) {
        val id = fourcc(); val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1) // chunks pad to even
        id match {
          case "LIST" => fourcc(); walk(next) // descend into list body
          case "avih" =>
            usPerFrame = bb.getInt.toLong
            bb.getInt; bb.getInt; bb.getInt
            nFrames = bb.getInt.toLong
            bb.getInt; bb.getInt; bb.getInt
            width = bb.getInt; height = bb.getInt
          case "00db" | "00dc" => framesSeen += 1
          case _ => // strh/strf/unknown: skip
        }
        bb.position(next)
      }
    walk(payload.length)
    VideoFeatures(0L, payload.length.toLong, width, height, nFrames,
      framesSeen, usPerFrame)
  }

  /** Video-container feature extraction — same mapPartitions batch shape
    * as the image and audio paths. */
  def videoFeatures(spark: SparkSession, media: DataFrame): Dataset[VideoFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        aviMetadata(payload).copy(doc_id = id)
      })
  }

  final case class VideoDecode(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Long,
      n_px: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      top_row_r: Long)

  /** Deterministic AVI with REAL uncompressed BI_RGB ('DIB ') frames —
    * the decodable twin of [[synthAvi]]: every '00db' chunk is a genuine
    * DIB pixel array (BGR byte order, rows BOTTOM-UP, stride padded to
    * 4 bytes), so [[videoDecodeFeatures]] performs actual video frame
    * decode, not container walking alone. Pixel law (row-constant, so
    * the DuckDB oracle states the sums in closed form over (frame, y)):
    * at logical row y of frame f — B=(id+7f+y)%256, G=(2id+f+y)%256,
    * R=(3id+f+2y)%256. Dims: w=8+id%16, h=4+id%8, frames=2+id%4. */
  def synthAviRgb(docId: Long): Array[Byte] = {
    val width = (8 + docId % 16).toInt
    val height = (4 + docId % 8).toInt
    val nFrames = (2 + docId % 4).toInt
    val usPerFrame = 33333
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height
    val bb = java.nio.ByteBuffer.allocate(224 + nFrames * (8 + frameBytes))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(216 + nFrames * (8 + frameBytes)); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(192); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(usPerFrame)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(nFrames)
    bb.putInt(0)
    bb.putInt(1)
    bb.putInt(0)
    bb.putInt(width); bb.putInt(height)
    (0 until 4).foreach(_ => bb.putInt(0))
    fourcc("LIST"); bb.putInt(116); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(usPerFrame)
    bb.putInt(1000000)
    bb.putInt(0)
    bb.putInt(nFrames)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40)
    bb.putInt(width); bb.putInt(height) // biHeight > 0: bottom-up rows
    bb.putShort(1.toShort); bb.putShort(24.toShort)
    bb.putInt(0)                 // BI_RGB — uncompressed
    bb.putInt(frameBytes)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    fourcc("LIST"); bb.putInt(4 + nFrames * (8 + frameBytes)); fourcc("movi")
    (0 until nFrames).foreach { f =>
      fourcc("00db"); bb.putInt(frameBytes)
      // bottom-up: file row 0 is LOGICAL row height-1
      (0 until height).foreach { fileRow =>
        val y = height - 1 - fileRow
        val b = ((docId + 7L * f + y) % 256).toInt
        val g = ((2L * docId + f + y) % 256).toInt
        val r = ((3L * docId + f + 2L * y) % 256).toInt
        (0 until width).foreach { _ =>
          bb.put(b.toByte); bb.put(g.toByte); bb.put(r.toByte)
        }
        (width * 3 until stride).foreach(_ => bb.put(0.toByte)) // row pad
      }
    }
    bb.array()
  }

  /** Attach a decodable BI_RGB AVI payload column. */
  def withAviRgbPayload(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, synthAviRgb(id))))
      .toDF("doc_id", "payload")
  }

  /** REAL video FRAME decode, pure JVM, for uncompressed BI_RGB AVIs:
    * walks the RIFF tree, reads the 'strf' BITMAPINFOHEADER for
    * dimensions / bit depth / compression, then decodes every '00db'
    * pixel array — BGR order, 4-byte row stride, bottom-up row
    * orientation (biHeight > 0) — into per-channel sums plus the R-sum
    * of frame 0's LOGICAL TOP row (file row height−1), which a decoder
    * that ignored the bottom-up convention would get wrong. Compressed
    * codecs (biCompression != 0) reject loudly rather than stub. */
  def decodeAviRgb(docId: Long, payload: Array[Byte]): VideoDecode = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourcc() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var bitCount = 0; var compression = -1
    var nFrames = 0L; var nPx = 0L
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var topRowR = 0L
    def walk(end: Int): Unit =
      while (bb.position() < end) {
        val id = fourcc(); val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1)
        id match {
          case "LIST" => fourcc(); walk(next)
          case "strf" =>
            bb.getInt // biSize
            width = bb.getInt; height = bb.getInt
            bb.getShort // biPlanes
            bitCount = bb.getShort.toInt
            compression = bb.getInt
            require(compression == 0 && bitCount == 24,
              s"unsupported codec: biCompression=$compression biBitCount=$bitCount " +
                "(only uncompressed 24-bit BI_RGB decodes here)")
          case "00db" | "00dc" =>
            require(compression == 0, "frame before strf header")
            val stride = (width * 3 + 3) & ~3
            require(sz == stride * height, s"frame size $sz != ${stride * height}")
            val base = bb.position()
            (0 until height).foreach { fileRow =>
              val rowOff = base + fileRow * stride
              val y = height - 1 - fileRow // bottom-up → logical row
              var x = 0
              while (x < width) {
                val off = rowOff + x * 3
                val b = payload(off) & 0xff
                val g = payload(off + 1) & 0xff
                val r = payload(off + 2) & 0xff
                sumB += b; sumG += g; sumR += r
                if (nFrames == 0 && y == 0) topRowR += r
                x += 1
              }
            }
            nPx += width.toLong * height
            nFrames += 1
          case _ =>
        }
        bb.position(next)
      }
    walk(payload.length)
    VideoDecode(docId, width, height, nFrames, nPx, sumR, sumG, sumB, topRowR)
  }

  /** Frame-decode pass — same mapPartitions batch shape as the other
    * media paths. */
  def videoDecodeFeatures(spark: SparkSession, media: DataFrame): Dataset[VideoDecode] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeAviRgb(id, payload) })
  }

  final case class VideoResize(
      doc_id: Long,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      n_frames: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      wsum_r: Long)

  /** Nearest-neighbor RESIZE of every decoded BI_RGB frame to a fixed
    * (outW, outH) grid — the normalize-before-featurize step a vision
    * training pipeline runs on every frame (all crops land on one
    * tensor shape). Pure integer index math, so the result replays in
    * closed form: output pixel (x', y') reads source pixel
    * (⌊x'·w/outW⌋, ⌊y'·h/outH⌋) — the standard floor-mapping NN kernel,
    * covering both up- and down-sampling (source w spans 8–23 around
    * outW, h spans 4–11 around outH). Emits per-channel sums over ALL
    * resized frames plus `wsum_r`, the (y'+1)-weighted R sum — a
    * row-position-sensitive checksum a resizer with a flipped or
    * off-by-one row map cannot fake. Every mapped pixel is READ from
    * the payload (no shortcut through the synthetic pixel law). */
  def resizeAviRgb(docId: Long, payload: Array[Byte],
      outW: Int, outH: Int): VideoResize = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourcc() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var compression = -1
    var nFrames = 0L
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsumR = 0L
    def walk(end: Int): Unit =
      while (bb.position() < end) {
        val id = fourcc(); val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1)
        id match {
          case "LIST" => fourcc(); walk(next)
          case "strf" =>
            bb.getInt
            width = bb.getInt; height = bb.getInt
            bb.getShort
            val bitCount = bb.getShort.toInt
            compression = bb.getInt
            require(compression == 0 && bitCount == 24,
              s"unsupported codec: biCompression=$compression")
          case "00db" | "00dc" =>
            require(compression == 0, "frame before strf header")
            val stride = (width * 3 + 3) & ~3
            require(sz == stride * height, s"frame size $sz != ${stride * height}")
            val base = bb.position()
            var yp = 0
            while (yp < outH) {
              val ySrc = yp * height / outH          // logical source row
              val rowOff = base + (height - 1 - ySrc) * stride // bottom-up
              var xp = 0
              while (xp < outW) {
                val off = rowOff + (xp * width / outW) * 3
                val b = payload(off) & 0xff
                val g = payload(off + 1) & 0xff
                val r = payload(off + 2) & 0xff
                sumB += b; sumG += g; sumR += r
                wsumR += (yp + 1).toLong * r
                xp += 1
              }
              yp += 1
            }
            nFrames += 1
          case _ =>
        }
        bb.position(next)
      }
    walk(payload.length)
    VideoResize(docId, width, height, outW, outH, nFrames,
      sumR, sumG, sumB, wsumR)
  }

  /** Resize pass over a payload frame — same mapPartitions batch shape
    * as the other media paths. */
  def videoResizeFeatures(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): Dataset[VideoResize] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => resizeAviRgb(id, p, outW, outH) })
  }

  final case class FrameHash(
      doc_id: Long,
      frame_idx: Long,
      ahash_lo: Long,
      ahash_hi: Long)

  /** Average-hash (aHash) image fingerprint per decoded frame — the
    * embedding-free image NEAR-DUP primitive: resize to an 8×8 grid
    * (the same floor-mapped nearest-neighbor sampling as
    * [[resizeAviRgb]]), luminance s = r+g+b per cell (exact ints), one
    * bit per cell set iff the cell is brighter than the frame mean —
    * the threshold 64·s > Σs is pure-integer, so the 64-bit hash is
    * bit-exact and replayable closed-form. Emitted as two BIGINT
    * halves (lo = cells 0..31, hi = 32..63) so neither engine rides
    * the sign bit; Hamming distance between hashes = visual
    * difference, computed downstream with bit_count(xor). */
  def aHashAviRgb(docId: Long, payload: Array[Byte]): Seq[FrameHash] = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourcc() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var compression = -1
    var frameIdx = 0L
    val out = Seq.newBuilder[FrameHash]
    def walk(end: Int): Unit =
      while (bb.position() < end) {
        val id = fourcc(); val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1)
        id match {
          case "LIST" => fourcc(); walk(next)
          case "strf" =>
            bb.getInt
            width = bb.getInt; height = bb.getInt
            bb.getShort
            val bitCount = bb.getShort.toInt
            compression = bb.getInt
            require(compression == 0 && bitCount == 24,
              s"unsupported codec: biCompression=$compression")
          case "00db" | "00dc" =>
            require(compression == 0, "frame before strf header")
            val stride = (width * 3 + 3) & ~3
            require(sz == stride * height, s"frame size $sz != ${stride * height}")
            val base = bb.position()
            val s = new Array[Long](64)
            var yp = 0
            while (yp < 8) {
              val ySrc = yp * height / 8
              val rowOff = base + (height - 1 - ySrc) * stride // bottom-up
              var xp = 0
              while (xp < 8) {
                val off = rowOff + (xp * width / 8) * 3
                s(yp * 8 + xp) = (payload(off) & 0xff).toLong +
                  (payload(off + 1) & 0xff) + (payload(off + 2) & 0xff)
                xp += 1
              }
              yp += 1
            }
            val total = s.sum
            var lo = 0L; var hi = 0L
            var idx = 0
            while (idx < 64) {
              if (64L * s(idx) > total) {
                if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
              }
              idx += 1
            }
            out += FrameHash(docId, frameIdx, lo, hi)
            frameIdx += 1
          case _ =>
        }
        bb.position(next)
      }
    walk(payload.length)
    out.result()
  }

  /** aHash pass over a payload frame — one fingerprint row per frame. */
  def videoAHash(spark: SparkSession, media: DataFrame): Dataset[FrameHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) => aHashAviRgb(id, p) }
  }

  final case class FrameSample(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Long,
      n_sampled: Long,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** Uniform FRAME SAMPLING: decode only `n` uniformly-spaced frames
    * (indices ⌊i·nFrames/n⌋, deduplicated when nFrames < n) and skip
    * the pixel arrays of every other frame entirely — the
    * don't-decode-what-you-don't-need pass a video pipeline runs
    * before featurizing hour-long clips. The walk still visits every
    * chunk header (that's how it counts n_frames), but only sampled
    * frames pay the pixel scan. */
  def sampleAviFrames(docId: Long, payload: Array[Byte], n: Int): FrameSample = {
    require(n > 0, "sampleAviFrames: n must be positive")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    bb.getInt
    require(fourcc() == "AVI ", "not an AVI file")
    var width = 0; var height = 0; var compression = -1
    var totalFrames = 0  // from the avih header — known before any frame
    var frameIdx = 0L
    var nSampled = 0L
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var sampled: Set[Long] = Set.empty
    def walk(end: Int): Unit =
      while (bb.position() < end) {
        val id = fourcc(); val sz = bb.getInt
        val next = bb.position() + sz + (sz & 1)
        id match {
          case "LIST" => fourcc(); walk(next)
          case "avih" =>
            bb.getInt; bb.getInt; bb.getInt; bb.getInt // us/frame, rate, pad, flags
            totalFrames = bb.getInt
            sampled = (0 until n).map(i => i.toLong * totalFrames / n).toSet
          case "strf" =>
            bb.getInt
            width = bb.getInt; height = bb.getInt
            bb.getShort
            val bitCount = bb.getShort.toInt
            compression = bb.getInt
            require(compression == 0 && bitCount == 24,
              s"unsupported codec: biCompression=$compression")
          case "00db" | "00dc" =>
            require(compression == 0, "frame before strf header")
            if (sampled.contains(frameIdx)) {
              val stride = (width * 3 + 3) & ~3
              require(sz == stride * height,
                s"frame size $sz != ${stride * height}")
              val base = bb.position()
              var fileRow = 0
              while (fileRow < height) {
                val rowOff = base + fileRow * stride
                var x = 0
                while (x < width) {
                  val off = rowOff + x * 3
                  sumB += payload(off) & 0xff
                  sumG += payload(off + 1) & 0xff
                  sumR += payload(off + 2) & 0xff
                  x += 1
                }
                fileRow += 1
              }
              nSampled += 1
            }
            frameIdx += 1
          case _ =>
        }
        bb.position(next)
      }
    walk(payload.length)
    FrameSample(docId, width, height, frameIdx, nSampled, sumR, sumG, sumB)
  }

  /** Frame-sampling pass — same mapPartitions batch shape. */
  def videoFrameSample(spark: SparkSession, media: DataFrame,
      n: Int): Dataset[FrameSample] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => sampleAviFrames(id, p, n) })
  }

  /** Bands per hash and bits per band for the multi-index Hamming
    * layout: 4 substrings of 16 bits (bands 0-1 tile `ahash_lo`,
    * 2-3 tile `ahash_hi`). 16-bit keys give 65 536 buckets per band —
    * wide enough to discriminate (a narrow split like 64/(t+1) ≈ 7
    * bits has ≤ 128 buckets and every bucket holds a constant fraction
    * of the corpus; measured in round 10 at 10-20× WORSE than brute
    * force). Recall comes from probe-side radius expansion instead:
    * see [[aHashNearDupProbe]]. */
  val AHashBands = 4
  val AHashBandBits = 16

  /** Band table over the 64-bit aHash (two nonneg BIGINT halves):
    * 4 × 16-bit substrings per hash, (band, bits) keyed — the
    * multi-index Hamming search layout (Norouzi, Punjani & Fleet,
    * "Fast Search in Hamming Space with Multi-Index Hashing", CVPR
    * 2012). A standing side is banded ONCE and probed forever. */
  def aHashBandTable(hashes: DataFrame): DataFrame = {
    val mask = lit((1L << AHashBandBits) - 1)
    val bands = (0 until AHashBands).map { b =>
      val half = if (b < 2) col("ahash_lo") else col("ahash_hi")
      struct(lit(b).as("band"),
        shiftright(half, (b % 2) * AHashBandBits).bitwiseAND(mask)
          .as("bits"))
    }
    hashes.select(col("doc_id"), col("frame_idx"),
        col("ahash_lo"), col("ahash_hi"),
        explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("frame_idx"),
        col("ahash_lo"), col("ahash_hi"),
        col("bb.band").as("band"), col("bb.bits").as("bits"))
  }

  /** Cross-document aHash near-dup probe, batch-vs-standing (the
    * d_fuzzy_inc shape on image fingerprints). The band join runs over
    * DISTINCT HASH VALUES, not frame rows: duplicate-heavy corpora
    * (screenshots, logos, near-black frames — and degenerate hash
    * spaces generally) collapse to their value set before any pair
    * forms, so a hash value shared by a million frames costs ONE band
    * row, and the candidate set is bounded by value-pair counts, never
    * row-pair counts. Verified value pairs (exact xor-popcount ≤
    * maxDist) then fan back to (doc, frame) rows with two
    * hash-equality joins — output-sized work. For high-entropy hashes
    * distinct ≈ identity and the 16-bit multi-index probe is
    * sub-quadratic; either way standing×standing and batch×batch
    * pairs never form. Recall is perfect for hamming ≤ maxDist (the
    * multi-index pigeonhole below), so the result equals the
    * all-pairs truth.
    * @param standing (doc_id, frame_idx, ahash_lo, ahash_hi) — band it
    *   via [[aHashIndex]] ONCE and pass both (the index is the
    *   reusable standing state) */
  def aHashNearDupProbe(standingIndex: DataFrame, standing: DataFrame,
      batch: DataFrame, maxDist: Int): DataFrame = {
    // Multi-index probe expansion: with 4 bands, two hashes within
    // maxDist bit flips have SOME band within r = maxDist/4 flips
    // (pigeonhole: the min of 4 nonneg integers summing to ≤ maxDist
    // is ≤ maxDist/4). So each batch band value probes its bucket AND
    // every bucket within r band-bits — all C(16, ≤r) masks, 137 for
    // the default maxDist 8 — against the EXACT-keyed standing index.
    // Lossless recall, and the keys stay 16-bit-selective.
    val r = maxDist / AHashBands
    val masks = (0 until (1 << AHashBandBits))
      .filter(java.lang.Integer.bitCount(_) <= r).map(_.toLong).toArray
    val bIdx = aHashIndex(batch)
      .select(col("band"), col("bits"),
        col("ahash_lo").as("b_lo"), col("ahash_hi").as("b_hi"))
      .withColumn("m", explode(lit(masks)))
      .select(col("band"), col("bits").bitwiseXOR(col("m")).as("bits"),
        col("b_lo"), col("b_hi"))
    val sIdx = standingIndex.select(col("band"), col("bits"),
      col("ahash_lo").as("s_lo"), col("ahash_hi").as("s_hi"))
    val valuePairs = bIdx.join(sIdx, Seq("band", "bits"))
      .select(col("b_lo"), col("b_hi"), col("s_lo"), col("s_hi"))
      .distinct() // a close value pair meets through several probes
      .withColumn("hamming",
        expr("bit_count(b_lo ^ s_lo) + bit_count(b_hi ^ s_hi)")
          .cast("long"))
      .where(col("hamming") <= maxDist)
    valuePairs
      .join(batch.select(col("doc_id"), col("frame_idx"),
          col("ahash_lo").as("b_lo"), col("ahash_hi").as("b_hi")),
        Seq("b_lo", "b_hi"))
      .join(standing.select(col("doc_id").as("src_doc"),
          col("frame_idx").as("src_frame"),
          col("ahash_lo").as("s_lo"), col("ahash_hi").as("s_hi")),
        Seq("s_lo", "s_hi"))
      .select(col("doc_id"), col("frame_idx"), col("src_doc"),
        col("src_frame"), col("hamming"))
  }

  /** Broadcast brute-force near-dup: every batch row against every
    * standing row through one codegen'd xor-popcount — zero shuffles,
    * no candidate materialization, the RIGHT plan when the row-pair
    * product is small (measured r10: 0.41 s vs the multi-index probe's
    * 1.87 s at 200k×2k = 4×10⁸ pairs). Same output as
    * [[aHashNearDupProbe]] — the probe is lossless, brute is
    * exhaustive, so they agree exactly. */
  def aHashNearDupBrute(standing: DataFrame, batch: DataFrame,
      maxDist: Int): DataFrame =
    broadcast(batch.select(col("doc_id"), col("frame_idx"),
        col("ahash_lo").as("b_lo"), col("ahash_hi").as("b_hi")))
      .crossJoin(standing.select(col("doc_id").as("src_doc"),
        col("frame_idx").as("src_frame"),
        col("ahash_lo").as("s_lo"), col("ahash_hi").as("s_hi")))
      .withColumn("hamming",
        expr("bit_count(b_lo ^ s_lo) + bit_count(b_hi ^ s_hi)")
          .cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("doc_id"), col("frame_idx"), col("src_doc"),
        col("src_frame"), col("hamming"))

  /** Default pairs entry point for r10's two measured regimes.
    * CROSSOVER-ADAPTIVE probe: brute and multi-index return the SAME
    * pairs (both lossless at hamming ≤ maxDist), so the pick is pure
    * economics — brute costs rows(standing)×rows(batch) popcounts with
    * zero shuffle; multi-index costs index setup + shuffle-priced
    * candidates but scales sub-quadratically. The r10 bench measured
    * the crossover near a 10¹⁰ row-pair product (4×10⁸ pairs: brute
    * 0.41 s, probe 1.87 s); below it brute wins on fixed costs, above
    * it brute's pair product is simply unpayable (at 100 TB it is
    * astronomically past the threshold and the probe self-selects).
    * The two `count()`s are AQE-style measured statistics — cheap
    * actions on the (typically localCheckpointed) inputs, paid once
    * per probe call. */
  def aHashNearDupAuto(standingIndex: DataFrame, standing: DataFrame,
      batch: DataFrame, maxDist: Int,
      bruteMaxPairs: Long = 10000000000L): DataFrame = {
    // Overflow-safe pair-product test: at 100 TB counts the raw product
    // sc*bc can wrap past 2^63 negative and falsely select brute (OOM).
    val sc = standing.count(); val bc = batch.count()
    val bruteOk = bc == 0L || sc <= bruteMaxPairs / bc
    if (bruteOk) aHashNearDupBrute(standing, batch, maxDist)
    else aHashNearDupProbe(standingIndex, standing, batch, maxDist)
  }

  /** The reusable standing near-dup index: the band table over the
    * corpus' DISTINCT hash values (duplicate-heavy corpora collapse
    * before any pair forms). Build once (localCheckpoint it), probe
    * forever — new batches never rescan the corpus. */
  def aHashIndex(hashes: DataFrame): DataFrame =
    aHashBandTable(
      hashes.select(col("ahash_lo"), col("ahash_hi")).distinct()
        .withColumn("doc_id", lit(0L)).withColumn("frame_idx", lit(0L)))
      .select(col("band"), col("bits"), col("ahash_lo"), col("ahash_hi"))

  /** Per-batch-doc near-dup rollup over verified probe pairs — the
    * gate-friendly terminal (one row per probing doc, not a pair
    * blow-up): how many standing frames sit within the threshold, how
    * many are exact, the closest distance, and how many distinct
    * standing docs contributed. */
  def aHashNearDupStats(pairs: DataFrame): DataFrame =
    pairs.groupBy("doc_id").agg(
      count(lit(1)).as("n_near"),
      sum(when(col("hamming") === 0L, 1L).otherwise(0L)).as("n_exact"),
      min("hamming").as("min_hamming"),
      countDistinct("src_doc").as("n_src_docs"))

  /** Declarative metadata-only variant (columnar, codegen'd, oracle-
    * checkable): identical feature math expressed as column functions —
    * the path a metadata query takes without ever decoding payloads. */
  def featuresSql(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    val h = Hashing.hash60(substring(col("text"), 1, 32))
    docs.select(
      col("doc_id"),
      length(payload).cast("long").as("byte_len"),
      ((h % 1024) + 1).cast("int").as("width"),
      ((shiftright(h, 10) % 1024) + 1).cast("int").as("height"),
      lit(3).as("channels"))
  }
}
