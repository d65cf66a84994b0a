package graft.graph

import graft.testkit.SparkSpec

/** Rescaled integer power iteration vs brute force and exact BigInt
  * rankings. */
class EigenvectorSpec extends SparkSpec {

  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var x = verts.map(_ -> 1L).toMap
    for (_ <- 1 to iterations) {
      val raw = edges.filter(e => x.contains(e._1))
        .groupBy(_._2).map { case (v, es) => v -> es.map(e => x(e._1)).sum }
      val sh = Hits.shiftOf(if (raw.isEmpty) 0L else raw.values.max)
      x = raw.map { case (v, s) => v -> (s >> sh) }
    }
    verts.map(v => v -> x.getOrElse(v, 0L)).toMap
  }

  private def exact(edges: Seq[(Long, Long)], iterations: Int)
      : Map[Long, BigInt] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var x = verts.map(_ -> BigInt(1)).toMap
    for (_ <- 1 to iterations) {
      x = edges.filter(e => x.contains(e._1))
        .groupBy(_._2).map { case (v, es) => v -> es.map(e => x(e._1)).sum }
    }
    verts.map(v => v -> x.getOrElse(v, BigInt(0))).toMap
  }

  test("matches the hand recurrence on a small graph") {
    // 0→2, 1→2, 2→0: after k=1 x=(1,0,2); k=2 x=(2,0,1)
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = EigenvectorCentrality.run(spark, edges, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 0L, 2L -> 1L), s"got $got")
  }

  test("matches the rescaled brute force past the overflow horizon") {
    val rnd = new scala.util.Random(67)
    val edges = Seq.fill(1000)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = EigenvectorCentrality.run(spark, edges.toDF("src", "dst"),
        iterations = 12)
      .as[(Long, Long)].collect().toMap
    assert(got == brute(edges, 12))
    // the rescale really fired
    assert(exact(edges, 12).values.max > BigInt(Long.MaxValue))
  }

  test("rescaled rankings match the exact BigInt recurrence") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(700)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val got = EigenvectorCentrality.run(spark, edges.toDF("src", "dst"),
          iterations = 9)
        .as[(Long, Long)].collect()
      val truth = exact(edges, 9)
      val rankGot = got.sortBy(t => (-t._2, t._1)).map(_._1).toSeq
      val rankTrue = truth.toSeq.sortBy { case (v, s) => (-s, v) }.map(_._1)
      assert(rankGot == rankTrue, s"ranking diverged (seed $seed)")
    }
  }
}
