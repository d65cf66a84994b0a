package graft.graph

import graft.testkit.SparkSpec

/** Katz centrality: hand recurrence, brute-force parity with the
  * identical rescale, and ranking stability of the rescaled scores
  * against the exact BigInt truncated-Katz sum. */
class KatzSpec extends SparkSpec {

  import spark.implicits._

  private def shiftOf(mx: Long): Int =
    math.max(0, (64 - java.lang.Long.numberOfLeadingZeros(mx)) - 31)

  /** Scala replica of the rescaled integer (p, y) recurrence. */
  private def brute(edges: Seq[(Long, Long)], iterations: Int,
                    alphaShift: Int): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var p = verts.map(_ -> 1L).toMap
    var y = verts.map(_ -> 0L).toMap
    for (_ <- 1 to iterations) {
      val pn = edges.groupBy(_._2)
        .map { case (v, es) => v -> es.map(e => p(e._1)).sum }
      val pAll = verts.map(v => v -> pn.getOrElse(v, 0L)).toMap
      val yAll = verts.map(v =>
        v -> ((y(v) << alphaShift) + pAll(v))).toMap
      val mx = (pAll.values ++ yAll.values).foldLeft(0L)(math.max)
      val s = shiftOf(mx)
      p = pAll.map { case (v, x) => v -> (x >> s) }
      y = yAll.map { case (v, x) => v -> (x >> s) }
    }
    y
  }

  /** Exact BigInt truncated Katz sum Σ_{k≤T} 2^(a(T-k))·walks_k —
    * the rescale-free truth. */
  private def exact(edges: Seq[(Long, Long)], iterations: Int,
                    alphaShift: Int): Map[Long, BigInt] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var p = verts.map(_ -> BigInt(1)).toMap
    var y = verts.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to iterations) {
      val pn = edges.groupBy(_._2)
        .map { case (v, es) => v -> es.map(e => p(e._1)).sum }
      p = verts.map(v => v -> pn.getOrElse(v, BigInt(0))).toMap
      y = verts.map(v => v -> ((y(v) << alphaShift) + p(v))).toMap
    }
    y
  }

  test("matches the hand recurrence on a small directed graph") {
    // path 0→1→2 plus 3→2. T=2, a=1:
    // walks_1: 1←{0}: 1, 2←{1,3}: 2; walks_2: 2←(0→1→2): 1
    // y_2(1) = 2·1 + 0 = 2; y_2(2) = 2·2 + 1 = 5; y_2(0) = y_2(3) = 0
    val edges = Seq((0L, 1L), (1L, 2L), (3L, 2L)).toDF("src", "dst")
    val got = Katz.run(spark, edges, iterations = 2, alphaShift = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 2L, 2L -> 5L, 3L -> 0L), s"got $got")
  }

  test("matches the brute-force rescaled recurrence on a random multigraph") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Katz.run(spark, edges.toDF("src", "dst"),
        iterations = 6, alphaShift = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == brute(edges, 6, 3))
  }

  test("rescale fires on a dense graph and preserves the exact ranking") {
    // Σdeg/|V| ≈ 75: walk counts pass 2^63 inside 12 iterations
    val rnd = new scala.util.Random(67)
    val edges = Seq.fill(1500)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val iters = 12
    val got = Katz.run(spark, edges.toDF("src", "dst"),
        iterations = iters, alphaShift = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == brute(edges, iters, 3))
    val truth = exact(edges, iters, 3)
    assert(truth.values.max > BigInt(Long.MaxValue)) // the shift really fired
    // rankings agree wherever the rescaled scores can still resolve them
    val vs = got.keys.toSeq
    for (a <- vs; b <- vs if a < b) {
      if (got(a) != got(b))
        assert((got(a) < got(b)) == (truth(a) < truth(b)),
          s"rank inversion at ($a, $b): got ${got(a)} vs ${got(b)}, " +
            s"exact ${truth(a)} vs ${truth(b)}")
    }
  }
}
