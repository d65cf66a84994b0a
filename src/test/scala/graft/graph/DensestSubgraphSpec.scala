package graft.graph

import graft.testkit.SparkSpec

class DensestSubgraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the exact peel: returns (bestVerts, bestNv,
    * bestNe, rounds). */
  private def brute(edges: Seq[(Long, Long)]): (Set[Long], Long, Long, Int) = {
    var live = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var verts = live.flatMap { case (a, b) => Seq(a, b) }.toSet
    var history = List.empty[(Set[Long], Long, Long)]
    var rounds = 0
    while (verts.nonEmpty) {
      history ::= ((verts, verts.size.toLong, live.size.toLong))
      val nv = verts.size.toLong
      val ne = live.size.toLong
      val deg = live.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val doomed = verts.filter(v => 2 * deg.getOrElse(v, 0L) * nv <= 5 * ne)
      verts = verts -- doomed
      live = live.filter { case (a, b) => verts(a) && verts(b) }
      rounds += 1
    }
    // exact rational argmax, earliest round on ties
    val ordered = history.reverse
    var best = ordered.head
    for (cand <- ordered.tail)
      if (BigInt(cand._3) * best._2 > BigInt(best._3) * cand._2) best = cand
    (best._1, best._2, best._3, rounds)
  }

  test("clique beats its pendant path — hand graph") {
    // K4 on 0-3 plus an 8-edge pendant path 3-4-…-11: round 0 has
    // nv=12, ne=14, so the threshold 2d·12 ≤ 5·14 strips exactly the
    // degree-≤2 path, and round 1's surviving K4 (density 6/4) wins.
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)) ++ (3L until 11L).map(i => (i, i + 1))
    val rows = DensestSubgraph.run(spark, edges.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet === Set(0L, 1L, 2L, 3L))
    assert(rows.forall(r => r._2 == 4L && r._3 == 6L && r._4 == 1.5))
  }

  test("matches the exact peel replica on random graphs") {
    for (seed <- Seq(3, 7)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      val (wantVs, wantNv, wantNe, wantRounds) = brute(edges)
      val (df, rounds) = DensestSubgraph.runCounted(spark, edges.toDF("src", "dst"))
      val rows = df.as[(Long, Long, Long, Double)].collect()
      assert(rows.map(_._1).toSet === wantVs)
      assert(rows.forall(r => r._2 == wantNv && r._3 == wantNe))
      assert(rounds === wantRounds)
    }
  }

  test("partitioning does not change the result") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = edges.toDF("src", "dst")
    val a = DensestSubgraph.run(spark, df)
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = DensestSubgraph.run(spark, df.repartition(7))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("edgeless input returns an empty frame") {
    val edges = Seq((5L, 5L)) // only a self loop — simple graph is empty
    val rows = DensestSubgraph.run(spark, edges.toDF("src", "dst")).collect()
    assert(rows.isEmpty)
  }
}
