package graft.graph

import graft.testkit.SparkSpec

/** Coreness (H-index fixpoint) and synchronous label propagation. */
class CorenessLpaSpec extends SparkSpec {

  import spark.implicits._

  test("coreness matches hand-computed hierarchy on clique+path+triangle") {
    // 4-clique (coreness 3) — path 3-4-5 — triangle 5-6-7 (coreness 2);
    // the path vertex 4 bridges two 2-cores so it is 2-core too
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (5L, 7L)).toDF("src", "dst")
    val got = Coreness.run(spark, edges).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 2L, 5L -> 2L, 6L -> 2L, 7L -> 2L), s"got $got")
  }

  test("coreness matches the brute-force peel on a random graph") {
    val rnd = new scala.util.Random(29)
    val raw = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Coreness.run(spark, raw.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // coreness(v) = max k such that v survives the k-peel
    val simple = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    def kcore(k: Int): Set[Long] = {
      var es = simple
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (v, xs) => v -> xs.size }
        val bad = deg.filter(_._2 < k).keySet
        changed = bad.nonEmpty
        es = es.filterNot(e => bad(e._1) || bad(e._2))
      }
      es.flatMap(e => Set(e._1, e._2))
    }
    val verts = simple.flatMap(e => Seq(e._1, e._2))
    val expected = verts.map { v =>
      v -> Iterator.from(1).takeWhile(k => kcore(k)(v)).toSeq.last.toLong
    }.toMap
    assert(got == expected)
  }

  test("lpa splits bridged triangles into two communities") {
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L)).toDF("src", "dst")
    val got = LabelPropagation.run(spark, edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    // replayed by hand (and by the DuckDB oracle): the second triangle
    // converges onto the bridge endpoint's label
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L), s"got $got")
  }

  test("local clustering coefficient matches hand computation") {
    // triangle 0-1-2 with pendant 2-3
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.localClustering(edges, Triangles.run(edges))
      .select("v", "lcc").as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 1.0, 1L -> 1.0, 2L -> (1.0 / 3.0), 3L -> 0.0),
      s"got $got")
  }

  test("lpa tie-break holds for negative vertex ids") {
    // the old argmax negated the LABEL inside the struct — a negative id
    // inverted the documented (cnt desc, label asc) order; this replays
    // the synchronous rounds by hand on a signed-id graph
    val rnd = new scala.util.Random(53)
    val raw = Seq.fill(150)((rnd.nextInt(41) - 20L, rnd.nextInt(41) - 20L))
    val rounds = 3
    val got = LabelPropagation.run(spark, raw.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap
    val simple = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val nbrs = simple.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var lab = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lab = nbrs.map { case (v, ns) =>
        val votes = ns.map(lab).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    assert(got == lab)
    // the graph really has negative labels in play
    assert(got.values.exists(_ < 0))
  }

  test("lpa is invariant to input partitioning and row order") {
    val rnd = new scala.util.Random(41)
    val raw = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val a = LabelPropagation.run(spark, raw.toDF("src", "dst"), rounds = 4)
      .as[(Long, Long)].collect().toMap
    val b = LabelPropagation.run(spark,
        scala.util.Random.shuffle(raw).toDF("src", "dst").repartition(7), rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // every vertex ends with a label that exists as a vertex id
    val verts = raw.filter(e => e._1 != e._2).flatMap(e => Seq(e._1, e._2)).toSet
    assert(a.values.toSet.subsetOf(verts))
  }
}
