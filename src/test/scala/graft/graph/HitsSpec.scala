package graft.graph

import graft.testkit.SparkSpec

/** Unnormalized integer HITS: hand recurrence + brute-force parity. */
class HitsSpec extends SparkSpec {

  import spark.implicits._

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
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var h = verts.map(_ -> 1L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      a = edges.filter(e => h.contains(e._1))
        .groupBy(_._2).map { case (v, es) => v -> es.map(e => h(e._1)).sum }
      h = edges.filter(e => a.contains(e._2))
        .groupBy(_._1).map { case (v, es) => v -> es.map(e => a(e._2)).sum }
    }
    val expected = verts.map(v =>
      v -> (a.getOrElse(v, 0L), h.getOrElse(v, 0L))).toMap
    assert(got == expected)
  }
}
