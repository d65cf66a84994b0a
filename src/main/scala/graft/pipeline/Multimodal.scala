package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    * ??? -> replace with a real codec (e.g. ffmpeg JNI for video/audio)
    * — signature stays `Array[Byte] => (width, height, channels)`. */
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
