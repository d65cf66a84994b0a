package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Phase attribution for st_ahash/mm_ahash_index (the slowest sweep
  * entries): standing decode+hash vs index build vs one probe vs stats.
  * usage: runMain graft.tools.StAhashProbe [sfDir]
  */
object StAhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.io.Tables.documents(spark, sfDir)
    val standingDocs = docs.where(col("doc_id") % 10 =!= 0)
    val batchDocs = docs.where(col("doc_id") % 10 === 0)
    val standing = t("standing_decode")(
      Multimodal.videoAHash(spark,
        Multimodal.withAviRgbPayload(spark, standingDocs)).toDF()
        .localCheckpoint())
    println("standing rows " + standing.count())
    val batch = t("batch_decode")(
      Multimodal.videoAHash(spark,
        Multimodal.withAviRgbPayload(spark, batchDocs)).toDF()
        .localCheckpoint())
    val index = t("index")(Multimodal.aHashIndex(standing).localCheckpoint())
    println("index rows " + index.count())
    val p1 = t("probe")(Multimodal.aHashNearDupProbe(index, standing, batch, 8)
      .localCheckpoint())
    println("pairs " + p1.count())
    t("probe2")(Multimodal.aHashNearDupProbe(index, standing, batch, 8)
      .localCheckpoint())
    t("stats")(Multimodal.aHashNearDupStats(p1)
      .write.format("noop").mode("overwrite").save())
    t("auto")(Multimodal.aHashNearDupStats(
      Multimodal.aHashNearDupAuto(index, standing, batch, 8))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
