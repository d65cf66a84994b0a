package graft.streaming

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming fuzzy match (st_fuzzy): the foreachBatch fold over the
  * persisted standing deletion-key index must end at EXACTLY the batch
  * incremental join's answer — cadence-independence is the operator's
  * contract (lossless per-pair blocking: every batch name meets the
  * full standing index in its own micro-batch). */
class FuzzyStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming fold equals the one-shot incremental join") {
    val streamed = FuzzyStreams.fuzzyMatchStreamingSink(spark, dir)
    val p = spark.read.parquet(s"$dir/part.parquet")
    val oneShot = graft.pipeline.FuzzyMatch.fuzzyPairsIncremental(
      p.where(col("p_partkey") % 10 =!= 0),
      p.where(col("p_partkey") % 10 === 0), col("p_name"))
    assert(streamed.count() > 0, "empty streaming result")
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "streaming fold differs from the one-shot incremental join")
  }

  test("refresh joins the index, not the catalog: index built once suffices") {
    // the standing index handed to fuzzyPairsAgainstIndex is all the
    // refresh reads — feeding a DIFFERENT frame as the index must
    // change the answer accordingly (i.e. the catalog itself is not
    // silently rescanned)
    val batch = Seq("acme corp", "acme corp2").toDF("p_name")
    val emptyIndex = graft.pipeline.FuzzyMatch.deletionKeyIndex(
      Seq.empty[String].toDF("p_name"), col("p_name"), 2, 64, "corpus_name")
    assert(graft.pipeline.FuzzyMatch
      .fuzzyPairsAgainstIndex(emptyIndex, batch, col("p_name")).isEmpty)
    val index = graft.pipeline.FuzzyMatch.deletionKeyIndex(
      Seq("acme corp.").toDF("p_name"), col("p_name"), 2, 64, "corpus_name")
    val got = graft.pipeline.FuzzyMatch
      .fuzzyPairsAgainstIndex(index, batch, col("p_name"))
      .as[(String, String, Int)].collect().toSet
    assert(got == Set(("acme corp", "acme corp.", 1),
      ("acme corp2", "acme corp.", 1)))
  }
}
