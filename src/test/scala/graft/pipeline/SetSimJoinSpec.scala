package graft.pipeline

import org.apache.spark.sql.functions._
import graft.testkit.SparkSpec

/** Prefix-filter set-similarity join: the lossless-completeness claim
  * (engine output == brute-force all-pairs truth) on corpora engineered
  * to stress the filter — shared boilerplate grams (big buckets the
  * prefix must avoid), rare-gram-only overlaps, size-skewed pairs near
  * the τ length boundary, and exact-duplicate sets (jaccard = 1). */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  // Word soup: docs 0/1 near-identical, 2 is 0's prefix excerpt, 3/4
  // share only boilerplate, 5 tiny, 6/7 identical, 8 disjoint.
  private val corpus = Seq(
    (0L, "a b c d e f g h i j k l m n o p"),
    (1L, "a b c d e f g h i j k l m n o q"),
    (2L, "a b c d e f g h"),
    (3L, "common gram one common gram two rare3a rare3b rare3c"),
    (4L, "common gram one common gram two rare4a rare4b rare4c"),
    (5L, "x y z"),
    (6L, "p q r s t u v w"),
    (7L, "p q r s t u v w"),
    (8L, "aa bb cc dd ee ff gg hh ii"))

  private def shingleSet(text: String, n: Int): Set[String] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  private def brute(tau: Double, n: Int = 3): Set[(Long, Long, Int, Int, Int)] =
    (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      sa = shingleSet(ta, n); sb = shingleSet(tb, n)
      if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= tau
    } yield (a, b, sa.size, sb.size, inter)).toSet

  private def engine(tau: Double): Set[(Long, Long, Int, Int, Int)] =
    Dedup.setSimilarityJoin(corpus.toDF("doc_id", "text"),
        col("doc_id"), col("text"), tau)
      .select(col("a"), col("b"), col("na").cast("int"),
        col("nb").cast("int"), col("ninter").cast("int"))
      .as[(Long, Long, Int, Int, Int)].collect().toSet

  test("prefix filter is lossless across thresholds") {
    Seq(0.3, 0.5, 0.8).foreach { tau =>
      assert(engine(tau) == brute(tau), s"tau=$tau")
    }
  }

  test("tau=1.0 finds exactly the identical shingle sets") {
    val got = engine(1.0)
    assert(got == brute(1.0))
    assert(got.map(t => (t._1, t._2)) == Set((6L, 7L)))
  }

  test("incremental join equals the cross-set brute force, no within-side pairs") {
    val (standing, batch) = corpus.partition(_._1 % 3 != 0)
    Seq(0.3, 0.5, 1.0).foreach { tau =>
      val got = Dedup.setSimilarityJoinIncremental(
          standing.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
          col("doc_id"), col("text"), tau)
        .select(col("new_id"), col("corpus_id"), col("ninter").cast("int"))
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        (b, tb) <- batch; (s2, ts) <- standing
        sb = shingleSet(tb, 3); ss = shingleSet(ts, 3)
        if sb.nonEmpty && ss.nonEmpty
        inter = (sb & ss).size
        if inter.toDouble / (sb.size + ss.size - inter) >= tau
      } yield (b, s2, inter)).toSet
      assert(got == want, s"tau=$tau")
      val bSet = batch.map(_._1).toSet
      assert(got.forall { case (nb, cs, _) => bSet(nb) && !bSet(cs) })
    }
  }

  test("jaccard column is the exact raw ratio") {
    val rows = Dedup.setSimilarityJoin(corpus.toDF("doc_id", "text"),
        col("doc_id"), col("text"), 0.3)
      .select("na", "nb", "ninter", "jaccard")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (na, nb, ni, j) =>
      assert(j == ni.toDouble / (na + nb - ni))
    }
  }
}
