package graft.graph

import graft.testkit.SparkSpec

class CommunityMetricsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force community scoring on the simple undirected graph. */
  private def brute(edges: Seq[(Long, Long)], labels: Map[Long, Long])
      : (Map[Long, (Long, Long, Long, Long)], Double) = {
    val simple = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val m = simple.size.toLong
    val deg = simple.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val per = labels.groupBy(_._2).map { case (c, vs) =>
      val verts = vs.keySet
      val intra = simple.count { case (a, b) => verts(a) && verts(b) }.toLong
      val cut = simple.count { case (a, b) =>
        (labels.get(a).contains(c)) != (labels.get(b).contains(c)) &&
          (verts(a) || verts(b))
      }.toLong
      val ds = verts.toSeq.map(v => deg.getOrElse(v, 0L)).sum
      c -> (vs.size.toLong, intra, cut, ds)
    }
    val q = per.values.map { case (_, intra, _, ds) =>
      intra.toDouble / m - math.pow(ds.toDouble / (2 * m), 2)
    }.sum
    (per, q)
  }

  test("two triangles joined by a bridge — hand values") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L),
      (5L, 3L), (2L, 3L))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L),
      (5L, 3L)).toDF("v", "label")
    val got = CommunityMetrics.communityStats(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // each community: 3 vertices, 3 intra edges, 1 cut edge, degree sum 7
    assert(got(0L) === (0L, 3L, 3L, 1L, 7L, Some(1.0 / 7.0)))
    assert(got(3L) === (3L, 3L, 3L, 1L, 7L, Some(1.0 / 7.0)))
    val qRow = CommunityMetrics.modularity(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(qRow._1 === 7L) // m
    assert(qRow._2 === 2L) // communities
    assert(qRow._3 === 6L) // intra total
    // Q = (4*7*6 - (49+49)) / (4*49) = 70/196
    assert(qRow._4 === Some(70.0 / 196.0))
  }

  test("single community covering the whole graph: conductance NULL, Q = 0") {
    val edges = Seq((0L, 1L), (1L, 2L))
    val labels = Seq((0L, 9L), (1L, 9L), (2L, 9L)).toDF("v", "label")
    val row = CommunityMetrics.communityStats(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect().head
    assert(row === (9L, 3L, 2L, 0L, 4L, None))
    val q = CommunityMetrics.modularity(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long, Option[Double])].collect().head._4
    assert(q === Some(0.0))
  }

  test("random graph with arbitrary labels matches brute force") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val labels = verts.map(v => v -> (v % 5)).toMap
    val (wantPer, wantQ) = brute(edges, labels)
    val ldf = labels.toSeq.toDF("v", "label")
    val got = CommunityMetrics
      .communityStats(edges.toDF("src", "dst"), ldf)
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got === wantPer)
    val q = CommunityMetrics.modularity(edges.toDF("src", "dst"), ldf)
      .as[(Long, Long, Long, Option[Double])].collect().head._4.get
    assert(math.abs(q - wantQ) < 1e-12)
  }

  test("isolated labeled vertex: degree 0, no conductance blowup") {
    val edges = Seq((0L, 1L))
    val labels = Seq((0L, 0L), (1L, 0L), (7L, 7L)).toDF("v", "label")
    val got = CommunityMetrics.communityStats(edges.toDF("src", "dst"), labels)
      .as[(Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(7L) === (7L, 1L, 0L, 0L, 0L, None))
    assert(got(0L) === (0L, 2L, 1L, 0L, 2L, None))
  }
}
