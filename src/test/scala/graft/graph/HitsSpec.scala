package graft.graph

import graft.testkit.SparkSpec

/** Integer HITS with power-of-two rescaling: hand recurrence,
  * brute-force parity (with the identical rescale), and ranking
  * stability of the rescaled scores against the exact BigInt
  * recurrence. */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  /** The implementation's shift rule, replicated. */
  private def shiftOf(mx: Long): Int =
    math.max(0, (64 - java.lang.Long.numberOfLeadingZeros(mx)) - 31)

  /** Scala replica of the rescaled integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, (Long, Long)] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var h = verts.map(_ -> 1L).toMap
    var a = Map.empty[Long, Long]
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val s = shiftOf(if (m.isEmpty) 0L else m.values.max)
      if (s == 0) m else m.map { case (v, x) => v -> (x >> s) }
    }
    for (_ <- 1 to iterations) {
      a = rescale(edges.filter(e => h.contains(e._1))
        .groupBy(_._2).map { case (v, es) => v -> es.map(e => h(e._1)).sum })
      h = rescale(edges.filter(e => a.contains(e._2))
        .groupBy(_._1).map { case (v, es) => v -> es.map(e => a(e._2)).sum })
    }
    verts.map(v => v -> (a.getOrElse(v, 0L), h.getOrElse(v, 0L))).toMap
  }

  /** Exact (unrescaled) recurrence in BigInt — the rescale-free truth. */
  private def exact(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, (BigInt, BigInt)] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var h = verts.map(_ -> BigInt(1)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to iterations) {
      a = edges.filter(e => h.contains(e._1))
        .groupBy(_._2).map { case (v, es) => v -> es.map(e => h(e._1)).sum }
      h = edges.filter(e => a.contains(e._2))
        .groupBy(_._1).map { case (v, es) => v -> es.map(e => a(e._2)).sum }
    }
    verts.map(v =>
      v -> (a.getOrElse(v, BigInt(0)), h.getOrElse(v, BigInt(0)))).toMap
  }

  test("matches the hand recurrence on a small directed graph") {
    // star: 0→1, 0→2, 3→1. After k=1: a(1)=2, a(2)=1, h(0)=3, h(3)=2.
    val edges = Seq((0L, 1L), (0L, 2L), (3L, 1L)).toDF("src", "dst")
    val got = Hits.run(spark, edges, iterations = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(0L -> (0L, 3L), 1L -> (2L, 0L), 2L -> (1L, 0L),
      3L -> (0L, 2L)), s"got $got")
  }

  test("matches a brute-force recurrence on a random multigraph") {
    val rnd = new scala.util.Random(37)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Hits.run(spark, edges.toDF("src", "dst"), iterations = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == brute(edges, 3))
  }

  test("runs past the old 3-iteration cap and matches the rescaled brute force") {
    // dense multigraph: Σdeg/|V| ≈ 60, so unrescaled scores would pass
    // BIGINT range inside 6 iterations — this exercises the shift path
    val rnd = new scala.util.Random(101)
    val edges = Seq.fill(1200)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val got = Hits.run(spark, edges.toDF("src", "dst"), iterations = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = brute(edges, 10)
    assert(got == want, s"got $got\nwant $want")
    // the rescale really fired: exact scores at 10 iterations overflow Long
    assert(exact(edges, 10).values.map(_._1).max > BigInt(Long.MaxValue))
  }

  test("rescaled rankings match the exact BigInt recurrence") {
    for (seed <- Seq(5, 17, 23)) {
      val rnd = new scala.util.Random(seed)
      val edges =
        Seq.fill(800)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val iters = 8
      val got = Hits.run(spark, edges.toDF("src", "dst"), iterations = iters)
        .as[(Long, Long, Long)].collect()
      val truth = exact(edges, iters)
      // sort both by (score desc, v asc); with 2^-31 truncation granularity
      // a rank inversion needs a relative gap under ~5e-10 — the property
      // the Scaladoc promises
      def rankGot(f: ((Long, Long, Long)) => Long) =
        got.sortBy(t => (-f(t), t._1)).map(_._1).toSeq
      def rankTrue(f: ((BigInt, BigInt)) => BigInt) =
        truth.toSeq.sortBy { case (v, s) => (-f(s), v) }.map(_._1)
      assert(rankGot(_._2) == rankTrue(_._1), s"authority ranking diverged (seed $seed)")
      assert(rankGot(_._3) == rankTrue(_._2), s"hub ranking diverged (seed $seed)")
    }
  }
}
