package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Standing-synopsis decontamination (d_decontam_kmv): the batch-only
  * refresh over maintained KMV synopses must equal the full recompute's
  * matrix EXACTLY (KMV merge-losslessness — k smallest distinct hashes
  * is a pure set function), including sources first seen in the batch. */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 32

  private def mkDocs(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  // 12-token docs so 8-gram shingles exist; overlapping suffixes give
  // src1/src2 shared fingerprints with the eval set
  private def words(tag: String, n: Int, shared: Int): String =
    ((0 until (n - shared)).map(i => s"$tag$i") ++
      (0 until shared).map(i => s"ev$i")).mkString(" ")

  private val docs = mkDocs(Seq(
    (1L, "src0", words("e", 12, 12)),          // the eval set
    (2L, "src0", words("f", 12, 4)),
    (10L, "src1", words("a", 12, 10)),         // standing, contaminated
    (11L, "src1", words("b", 12, 0)),          // standing, clean
    (20L, "src2", words("c", 12, 0)),          // standing, clean
    (30L, "src1", words("d", 12, 11)),         // batch (doc_id % 10 == 0)
    (40L, "src3", words("g", 12, 9))))         // batch-only NEW source

  test("refresh over maintained synopses equals the full recompute") {
    val standing = docs.where(col("doc_id") % 10 =!= 0 ||
      col("source") === "src0")
    val batch = docs.where(col("doc_id") % 10 === 0 &&
      col("source") =!= "src0")
    val (standingSk, evalSk) = Decontam.standingState(standing, "src0", K)
    val viaRefresh = Decontam.refresh(standingSk, evalSk, batch, "src0", K)
    // full recompute: one synopsis per source over ALL its docs
    val (fullSk, fullEval) = Decontam.standingState(docs, "src0", K)
    val viaFull = Decontam.refresh(fullSk, fullEval,
      docs.limit(0), "src0", K) // empty batch: matrix from synopses alone
    assert(viaRefresh.count() == 3) // src1, src2, src3
    assert(viaRefresh.exceptAll(viaFull).isEmpty &&
      viaFull.exceptAll(viaRefresh).isEmpty,
      "maintained-synopsis refresh differs from full recompute")
    // the new-in-batch source entered via the full-outer merge
    assert(viaRefresh.where(col("source") === "src3").count() == 1)
    // contamination ordering is sane: src1 (shared grams) above src2 (none)
    val byScore = viaRefresh.select("source", "rho").as[(String, Long)]
      .collect().toMap
    assert(byScore("src2") == 0L)
    assert(byScore("src1") > 0L)
  }

  test("streaming synopsis fold equals the one-shot batch matrix") {
    // st_decontam's contract: KMV union is associative+commutative, so
    // the per-micro-batch fold ends at d_decontam_kmv's exact answer
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.DecontamStreams
      .decontamStreamingSink(spark, dir)
    val oneShot = graft.SparkEntry.queries("d_decontam_kmv")(spark, dir)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "streaming synopsis fold differs from the one-shot matrix")
  }
}
