package graft.streaming

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Cadence-equality for the streaming aHash near-dup index: the
  * accumulated rollup must equal the one-shot batch probe at ANY file
  * split — banding is recall-lossless, each batch meets the full
  * standing index, and staged files are disjoint. */
class AHashStreamsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def batchTruth() = {
    val h = Multimodal.videoAHash(spark,
      Multimodal.withAviRgbPayload(spark,
        graft.io.Tables.documents(spark, dir))).toDF()
    val standing = h.where(col("doc_id") % 10 =!= 0)
    Multimodal.aHashNearDupStats(
      Multimodal.aHashNearDupProbe(
        Multimodal.aHashIndex(standing), standing,
        h.where(col("doc_id") % 10 === 0), 8))
  }

  test("streaming rollup equals the one-shot probe at 2 and 4 files") {
    val b = batchTruth()
    Seq(2, 4).foreach { nFiles =>
      val s = AHashStreams.aHashStreamingSink(spark, dir, nFiles = nFiles)
      assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
        s"streaming($nFiles files) != batch")
    }
  }
}
