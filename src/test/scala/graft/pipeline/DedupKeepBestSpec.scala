package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-priority near-dup resolution must keep the HIGHEST-quality
  * member of each cluster — not the min-id one — and fall back to the
  * smallest id only on exact quality ties. */
class DedupKeepBestSpec extends SparkSpec {
  import spark.implicits._

  // 150-token word soup, distinct tokens, no stopwords
  private def soup(seed: Int): Seq[String] =
    (0 until 150).map(i => s"w${seed}x$i")

  test("the cleaner near-duplicate survives regardless of id order") {
    val base = soup(1)
    // doc 1 (LOWER id): degraded copy — stopwords spliced in lower its
    // quality score; still ~same shingle set tail -> same LSH cluster
    val dirty = Seq("the", "of", "and", "is", "the", "a") ++ base.drop(6)
    // doc 2: the clean original
    val docs = Seq(
      (1L, dirty.mkString(" ")),
      (2L, base.mkString(" ")),
      (50L, soup(9).mkString(" "))  // unrelated singleton: not emitted
    ).toDF("doc_id", "text")

    val out = Dedup.dedupKeepBest(spark, docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap

    assert(out.keySet == Set(1L, 2L), s"cluster membership wrong: ${out.keySet}")
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L, "one cluster expected")
    assert(out(2L)._2 > out(1L)._2, "clean copy must score higher")
    assert(out(2L)._3 && !out(1L)._3,
      "keep-best must retain the higher-quality doc, not the lower id")
  }

  test("exact quality tie falls back to the smallest doc_id") {
    val a = soup(3)
    // identical token multiset -> identical quality scores, same cluster
    val docs = Seq((7L, a.mkString(" ")), (4L, a.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.dedupKeepBest(spark, docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out == Map(4L -> true, 7L -> false))
  }
}
