package graft.tools

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Can a VARIANT value live inside transformWithState state? Probe the
  * encoder surface: (a) VariantVal in a product encoder, (b) the
  * fallback — variant kept as its (metadata, value) binary pair. */
object VariantStateProbe {
  final case class VHolder(v: org.apache.spark.unsafe.types.VariantVal)
  final case class BHolder(metadata: Array[Byte], value: Array[Byte])

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val e = Encoders.product[VHolder]
      println(s"OK   variant-encoder: $e")
      val df = spark.sql("""SELECT parse_json('{"a": 1}') AS v""")
      val ds = df.as(e)
      println("OK   as[VHolder]: " + ds.head().v.toString)
    } catch { case ex: Throwable =>
      println(s"FAIL variant-encoder: ${ex.getMessage.take(200)}") }
    try {
      val df = spark.sql(
        """SELECT to_binary(null) AS metadata, to_binary(null) AS value""")
      println("OK   binary-holder encoder: " + Encoders.product[BHolder])
    } catch { case ex: Throwable =>
      println(s"FAIL binary-holder: ${ex.getMessage.take(200)}") }
    spark.stop()
  }
}
