package graft.graph

import graft.functions.Hashing
import graft.testkit.SparkSpec

class MinimumSpanningForestSpec extends SparkSpec {
  import spark.implicits._

  private def w(vi: Long, vj: Long): Long =
    Hashing.hash60Local(s"${MinimumSpanningForest.WeightSeed}|$vi|$vj")

  /** Kruskal with union-find over the identical (w, vi, vj) total
    * order — an independent algorithm arriving at the same unique
    * forest. */
  private def kruskal(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val simple = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for ((vi, vj) <- simple.map { case (a, b) => (a, b) }
        .sortBy { case (a, b) => (w(a, b), a, b) }) {
      val (ra, rb) = (find(vi), find(vj))
      if (ra != rb) { parent(ra) = rb; out += ((vi, vj, w(vi, vj))) }
    }
    out.toSet
  }

  test("matches Kruskal on random graphs") {
    for (seed <- Seq(2, 11)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val want = kruskal(edges)
      val (df, rounds) = MinimumSpanningForest.runCounted(spark, edges.toDF("src", "dst"))
      val got = df.as[(Long, Long, Long)].collect().toSet
      assert(got === want)
      // Borůvka halves components per round — well under the 40 cap
      assert(rounds <= 10)
    }
  }

  test("forest spans: |E| = |V| - #components, per component") {
    val edges = Seq( // two components: a triangle+tail, and a 4-cycle
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val got = MinimumSpanningForest.run(spark, edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect()
    assert(got.length === 6) // 8 vertices - 2 components
    assert(got.count(e => e._1 >= 10L) === 3)
    assert(got === got.distinct)
  }

  test("partitioning does not change the forest") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(250)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val df = edges.toDF("src", "dst")
    val a = MinimumSpanningForest.run(spark, df)
      .as[(Long, Long, Long)].collect().toSet
    val b = MinimumSpanningForest.run(spark, df.repartition(7))
      .as[(Long, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("self-loop-only input yields an empty forest") {
    val got = MinimumSpanningForest.run(spark,
      Seq((4L, 4L)).toDF("src", "dst")).collect()
    assert(got.isEmpty)
  }
}
