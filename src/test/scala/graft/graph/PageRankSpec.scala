package graft.graph

import graft.testkit.SparkSpec
import graft.io.EdgeListIO
import org.apache.spark.sql.functions._

/** Golden-file parity with the reference (`/root/reference/result/
  * <name>-pr-p.txt`, checker tolerance 1e-4 per
  * `correctness_checker.cpp:34-56`) plus the dense-universe and
  * dangling-mass semantics FIXTURES.md §5 calls out. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def golden(name: String): Unit = {
    val edges = EdgeListIO.readValidated(spark, s"/root/reference/test/$name.txt")
    val ranks = PageRank.run(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (expected, _) = EdgeListIO.parseGolden(s"/root/reference/result/$name-pr-p.txt")
    assert(ranks.keySet == expected.keySet,
      s"id universe differs: got ${ranks.size} ids, expected ${expected.size}")
    val maxDiff = expected.map { case (id, v) => math.abs(ranks(id) - v) }.max
    assert(maxDiff <= 1e-4, f"max |diff| $maxDiff%.2e exceeds checker tolerance 1e-4")
  }

  test("bull matches reference golden output")   { golden("bull") }
  test("diamond matches reference golden output") { golden("diamond") }

  test("dense-universe semantics: unseen ids are dangling pages") {
    // edges only among {0,1,7} → websize 8, ids 2..6 dangling rows
    val edges = Seq((0L, 1L), (1L, 7L), (7L, 0L)).toDF("src", "dst")
    val ranks = PageRank.run(spark, edges)
    assert(ranks.count() == 8)
    val m = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((2L to 6L).forall(m(_) > 0.0), "dangling pages still receive teleport mass")
  }

  test("personalized PageRank matches the hand recurrence") {
    // cycle 0→1→2→0 plus 1→3 with 3 dangling; restart on {0, 3}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq(0L, 3L)
    val iters = 3
    val got = PageRank.runPersonalized(spark, edges, 4L, seeds, iters)
      .as[(Long, Double)].collect().toMap
    // replica of the exact update (normalize → contribute → restart)
    val n = 4
    val alpha = 0.85
    val outdeg = Map(0L -> 1.0, 1L -> 2.0, 2L -> 1.0)
    val p = Array(0.5, 0.0, 0.0, 0.5)
    var pr = p.clone()
    for (k <- 0 until iters) {
      val sum = pr.sum
      val dangling = pr(3)
      val old = if (k == 0) pr.clone() else pr.map(_ / sum)
      val h = Array.fill(4)(0.0)
      for ((s, d) <- Seq((0, 1), (1, 2), (2, 0), (1, 3)))
        h(d) += old(s) / outdeg(s.toLong)
      pr = Array.tabulate(4)(i =>
        h(i) * alpha + (alpha * dangling + (1.0 - alpha)) * p(i))
    }
    for (i <- 0 until 4)
      assert(math.abs(got(i.toLong) - pr(i)) < 1e-12,
        s"id $i: ${got(i.toLong)} vs ${pr(i)}")
    // restart keeps mass near the seeds: both seeds outrank the
    // never-restarted vertex furthest from them only via structure —
    // just sanity-check mass conservation here
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("star with dangling sink: ranks sum to ~1 and sink dominates") {
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L)).toDF("src", "dst")
    val m = PageRank.run(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-6)
    assert(m(0L) > m(1L) && m(1L) == m(2L))
  }
}
