package graft.graph

import graft.testkit.SparkSpec

/** Link prediction: brute-force parity on random graphs, hand example,
  * and the hub cap's witness-filtering semantics. */
class LinkPredictionSpec extends SparkSpec {

  import spark.implicits._

  /** Brute-force replica over neighbor sets. */
  private def brute(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Double, Double)] = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = (simple ++ simple.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val verts = nbrs.keys.toSeq
    val out = for {
      u <- verts; w <- verts
      if u < w && !nbrs(u).contains(w)
      common = nbrs(u) & nbrs(w)
      if common.nonEmpty
    } yield {
      val aa = common.toSeq.sorted
        .map(v => 1.0 / math.log(nbrs(v).size.toDouble)).foldLeft(0.0)(_ + _)
      val jac = common.size.toDouble / (nbrs(u).size + nbrs(w).size - common.size)
      (u, w) -> (common.size.toLong,
        BigDecimal(aa).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        jac)
    }
    out.toMap
  }

  test("matches the hand example on a path-plus-fork graph") {
    // 0-1, 1-2, 0-3: non-adjacent pairs with a witness: (0,2) via 1,
    // (1,3) via 0, (2,3) none (no shared neighbor? 2:{1}, 3:{0} — none)
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = LinkPrediction.run(spark, edges)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got.keySet == Set((0L, 2L), (1L, 3L)))
    val (cn, aa, jac) = got((0L, 2L))
    assert(cn == 1L)                              // witness: 1, deg(1)=2
    assert(math.abs(aa - 1.0 / math.log(2.0)) < 1e-9)
    assert(jac == 1.0 / 2.0)                      // |{1}| / |{1,3}∪{1}|
  }

  test("matches brute force on random multigraphs") {
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val edges =
        Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = LinkPrediction.run(spark, edges.toDF("src", "dst"))
        .as[(Long, Long, Long, Double, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
      val want = brute(edges)
      assert(got.keySet == want.keySet)
      for (k <- want.keySet) {
        assert(got(k)._1 == want(k)._1, s"cn at $k")
        assert(math.abs(got(k)._2 - want(k)._2) < 1e-9, s"aa at $k")
        assert(got(k)._3 == want(k)._3, s"jaccard at $k")
      }
    }
  }

  test("the hub cap drops witnesses routed through capped centers") {
    // star: hub 9 adjacent to 0..3; all leaf pairs share only hub 9
    val edges = (0L to 3L).map(v => (9L, v)).toDF("src", "dst")
    assert(LinkPrediction.run(spark, edges).count() == 6)
    assert(LinkPrediction.run(spark, edges, maxCenterDegree = Some(3)).count() == 0)
  }
}
