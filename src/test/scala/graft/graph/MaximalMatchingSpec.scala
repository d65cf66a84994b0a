package graft.graph

import graft.testkit.SparkSpec
import graft.functions.Hashing

/** Israeli-Itai rounds vs the sequential greedy matching of the
  * priority order, plus maximality, determinism, and the O(log) round
  * bound. */
class MaximalMatchingSpec extends SparkSpec {

  import spark.implicits._

  /** Sequential greedy matching over (hash priority, vi, vj) order —
    * the fixpoint the parallel rounds must land on. */
  private def greedy(edges: Seq[(Long, Long)], seed: Long): Set[(Long, Long)] = {
    val eu = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val ranked = eu.map { case (a, b) =>
      (Hashing.hash60Local(s"$seed|$a|$b"), a, b)
    }.sorted
    val used = scala.collection.mutable.Set.empty[Long]
    val out = Set.newBuilder[(Long, Long)]
    for ((_, a, b) <- ranked if !used(a) && !used(b)) {
      used += a; used += b; out += ((a, b))
    }
    out.result()
  }

  private def got(edges: Seq[(Long, Long)], seed: Long): Set[(Long, Long)] =
    MaximalMatching.run(spark, edges.toDF("src", "dst"), seed)
      .as[(Long, Long)].collect().toSet

  test("matches the sequential greedy matching on random graphs") {
    for (seed <- Seq(3L, 7L)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(150)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      val want = greedy(edges, seed = 13L)
      val g = got(edges, seed = 13L)
      assert(g == want, s"input seed $seed: got $g\nwant $want")
      assert(g.nonEmpty)
    }
  }

  test("result is a maximal matching and deterministic across partitionings") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(200)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val m = got(edges, seed = 5L)
    // matching: no vertex twice
    val vs = m.toSeq.flatMap(e => Seq(e._1, e._2))
    assert(vs.distinct.size == vs.size, "vertex matched twice")
    // maximal: every live edge touches a matched vertex
    val matchedV = vs.toSet
    val eu = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    eu.foreach { case (a, b) =>
      assert(matchedV(a) || matchedV(b), s"edge ($a,$b) unmatched but free") }
    // partitioning must not change the result
    val m2 = MaximalMatching.run(spark,
        scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(9), 5L)
      .as[(Long, Long)].collect().toSet
    assert(m == m2)
  }

  test("drains a long path in O(log) rounds and handles edge cases") {
    // tailThreshold = 0 pins the PURE distributed regime (the default
    // cutover would finish a 300-edge path in the sequential tail)
    val path = (0L until 300L).map(i => (i, i + 1))
    val (m, rounds) = MaximalMatching.runCounted(spark, path.toDF("src", "dst"),
      1L, tailThreshold = 0)
    assert(m.count() >= 100, "path matching too small") // maximal ≥ n/3
    assert(rounds <= 14, s"too many rounds: $rounds")   // O(log |E|) w.h.p.
    // self-loop-only input: empty matching, no crash
    val empty = got(Seq((4L, 4L)), 1L)
    assert(empty.isEmpty)
  }

  test("sequential tail cutover is bit-identical to the distributed regime") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(300)((rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
    val path = (200L until 260L).map(i => (i, i + 1))
    for ((es, label) <- Seq((edges, "random"), (path, "path"),
        (edges ++ path, "mixed"))) {
      val df = es.toDF("src", "dst")
      def mm(t: Int) = MaximalMatching.run(spark, df, seed = 13L, tailThreshold = t)
        .as[(Long, Long)].collect().toSet
      val dist = mm(0)        // pure distributed
      val tail = mm(4096)     // everything in the tail
      val mid = mm(16)        // a few distributed rounds, then the tail
      assert(dist == greedy(es, 13L), s"$label: distributed != sequential greedy")
      assert(tail == dist, s"$label: full-tail regime diverged")
      assert(mid == dist, s"$label: mid-flight cutover diverged")
    }
  }
}
