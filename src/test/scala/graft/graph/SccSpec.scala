package graft.graph

import graft.testkit.SparkSpec

/** SCC coloring peel vs brute-force mutual reachability. */
class SccSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force: scc(v) = min of the mutually-reachable set. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._2).toSet }
    def reach(s: Long): Set[Long] = {
      var seen = Set(s)
      var frontier = Set(s)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        seen ++= frontier
      }
      seen
    }
    val r = verts.map(v => v -> reach(v)).toMap
    verts.map(v => v -> r(v).filter(w => r(w).contains(v)).min).toMap
  }

  /** Runs BOTH regimes — the pure distributed peel (tailThreshold = 0)
    * and the default, which finishes these small graphs in the bounded
    * sequential Kosaraju tail — and asserts they agree, so every test
    * in this suite pins the r14 cutover against the distributed path. */
  private def got(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val dist = StronglyConnectedComponents.run(spark, df, tailThreshold = 0)
      .as[(Long, Long)].collect().toMap
    val tail = StronglyConnectedComponents.run(spark, df)
      .as[(Long, Long)].collect().toMap
    assert(dist == tail, "distributed and sequential-tail regimes diverged")
    // mid-flight cutover: a few distributed peel rounds, then the tail
    val mid = StronglyConnectedComponents.run(spark, df, tailThreshold = 16)
      .as[(Long, Long)].collect().toMap
    assert(dist == mid, "mid-flight cutover diverged")
    dist
  }

  test("hand graphs: cycles, DAG bridges, self-loops") {
    // two 3-cycles joined by a one-way bridge, plus a pendant DAG tail
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), // SCC {0,1,2}
      (2L, 3L),                     // bridge (one-way)
      (3L, 4L), (4L, 5L), (5L, 3L), // SCC {3,4,5}
      (5L, 6L), (6L, 7L),           // DAG tail: singletons
      (8L, 8L))                     // self-loop: singleton
    assert(got(edges) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 3L, 4L -> 3L, 5L -> 3L, 6L -> 6L, 7L -> 7L, 8L -> 8L))
  }

  test("a pure DAG yields all singletons") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(got(edges) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("one big cycle is one SCC") {
    val n = 30L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    assert(got(edges) == (0L until n).map(_ -> 0L).toMap)
  }

  test("matches brute force on random digraphs") {
    for (seed <- Seq(7, 19, 43)) {
      val rnd = new scala.util.Random(seed)
      // sparse enough that the SCC structure is non-trivial (many small
      // components plus a few larger ones)
      val edges = Seq.fill(90)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val want = brute(edges)
      val g = got(edges)
      assert(g == want, s"seed $seed: got $g\nwant $want")
      // the structure exercised both paths: some multi-vertex SCC exists
      // in at least one seed — checked collectively below
    }
    // denser case: giant SCC + periphery
    val rnd = new scala.util.Random(91)
    val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val want = brute(edges)
    assert(got(edges) == want)
    assert(want.groupBy(_._2).values.map(_.size).max > 1, "no multi-vertex SCC")
  }

  test("condensation DAG and size stats compose over the labels") {
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), // SCC {0,1,2}
      (2L, 3L), (1L, 3L),           // two original edges, ONE condensed
      (3L, 4L), (4L, 3L),           // SCC {3,4}
      (4L, 5L))                     // singleton 5
    val scc = StronglyConnectedComponents.run(spark, edges.toDF("src", "dst"))
    val cond = StronglyConnectedComponents
      .condense(edges.toDF("src", "dst"), scc)
      .as[(Long, Long)].collect().toSet
    assert(cond == Set((0L, 3L), (3L, 5L)))
    val stats = StronglyConnectedComponents.stats(scc)
      .as[(Long, Long)].collect().toSet
    assert(stats == Set((3L, 1L), (2L, 1L), (1L, 1L)))
    // the condensation is acyclic: no mutual pairs
    cond.foreach { case (a, b) => assert(!cond.contains((b, a))) }
  }

  test("negative vertex ids work (labels are plain minima)") {
    val edges = Seq((-5L, -1L), (-1L, -5L), (-1L, 2L), (2L, 3L), (3L, 2L))
    assert(got(edges) == Map(-5L -> -5L, -1L -> -5L, 2L -> 2L, 3L -> 2L))
  }
}
