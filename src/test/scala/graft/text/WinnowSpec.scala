package graft.text

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Winnowing's contract: any shared token run of length ≥ w+k−1 MUST
  * yield a shared fingerprint hash across documents, density is ~2/(w+1),
  * and the selection is position-shift invariant (fingerprints are gram
  * hashes, not positions). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def soup(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"w${graft.functions.Hashing.hash60Local(s"$seed.$i") % 89}")

  /** Plain-Scala winnowing twin (k=3, w=4) returning fingerprint hashes. */
  private def fpHashes(tk: Seq[String]): Set[Long] = {
    val hs = tk.indices.dropRight(2).map(i =>
      graft.functions.Hashing.hash60Local(tk.slice(i, i + 3).mkString(" ")))
    (0 to hs.length - 4).map { j =>
      val win = hs.slice(j, j + 4)
      val m = win.min
      hs(j + win.lastIndexOf(m))
    }.toSet
  }

  test("operator equals the plain-Scala twin on random soups") {
    val docs = (1L to 6L).map(i => (i, soup(i.toInt, 60 + i.toInt * 13).mkString(" ")))
    val got = TextAnalysis.winnow(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    docs.foreach { case (id, text) =>
      val fps = fpHashes(text.split(" ").toSeq)
      assert(got(id)._1 == fps.size.toLong, s"doc $id n_fps")
      assert(got(id)._2 == fps.map(_ % ((1L << 31) - 1)).sum, s"doc $id checksum")
    }
  }

  test("a shared 6-token run always produces a shared fingerprint") {
    val shared = soup(99, 6) // w+k-1 = 6 tokens
    for (trial <- 1 to 10) {
      val a = soup(trial, 40) ++ shared ++ soup(trial + 50, 40)
      val b = soup(trial + 100, 25) ++ shared ++ soup(trial + 150, 55)
      val common = fpHashes(a).intersect(fpHashes(b))
      // the shared run spans >= 4 consecutive gram positions in both docs
      // -> at least one full window lies inside it on each side, and the
      // rightmost-min rule picks the same gram hash there
      assert(common.nonEmpty, s"trial $trial: guarantee violated")
    }
  }

  test("winnowCandidates pairs docs sharing a long run; disjoint docs never pair") {
    val shared = soup(42, 30)
    val docs = Seq(
      1L -> (soup(1, 40) ++ shared ++ soup(2, 40)),   // contains the run
      2L -> (soup(3, 25) ++ shared ++ soup(4, 55)),   // contains the run
      3L -> soup(5, 120))                              // disjoint soup
      .map { case (i, tk) => (i, tk.mkString(" ")) }
    val pairs = graft.pipeline.Dedup.winnowCandidates(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "docs sharing a 30-token run must be candidates")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the disjoint doc must not pair with anything")
  }

  test("density approaches the 2/(w+1) expectation") {
    val out = TextAnalysis.winnow(
        Seq((1L, soup(7, 2000).mkString(" "))).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .head()
    val density = out.getLong(3) / 1e6
    assert(density > 0.2 && density < 0.6, s"density $density implausible")
  }
}
