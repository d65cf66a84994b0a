package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion: hand-computed scores, absent-list handling,
  * deterministic cut, and the topRanked list builder. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse matches hand-computed scores and handles absent docs") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

    def s(ranks: Int*) = BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(20L) == ((20L, 2L, 1L, s(2, 1)))) // in both lists
    assert(byDoc(10L) == ((10L, 1L, 0L, s(1))))    // only list A
    assert(byDoc(40L) == ((40L, 0L, 2L, s(2))))    // only list B
    assert(byDoc(30L) == ((30L, 3L, 0L, s(3))))
    // doc 20 (both lists) must outrank every single-list doc
    assert(out.head._1 == 20L)
  }

  test("rrf ties break by doc_id and topN cuts after rounding") {
    // same rank in one list each -> identical scores -> id order decides
    val a = Seq((5L, 1)).toDF("doc_id", "rank")
    val b = Seq((3L, 1)).toDF("doc_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 60, topN = 1).collect()
    assert(out.length == 1 && out(0).getLong(0) == 3L)
  }

  test("topRanked produces a dense 1..n list under the declared order") {
    val df = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1))
      .toDF("id", "sc")
    val out = Similarity.topRanked(df, col("sc"), col("id"), n = 3)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // 0.9 tie: lower id first
    assert(out == Seq((2L, 1), (3L, 2), (1L, 3)))
  }
}
