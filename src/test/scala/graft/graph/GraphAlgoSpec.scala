package graft.graph

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the OINK graph primitives and iterative algorithms
  * on hand-checkable graphs (SURVEY.md §7.4). */
class GraphAlgoSpec extends SparkSpec {
  import spark.implicits._

  private val tiny = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 4L), (4L, 4L), (0L, 1L))
    .toDF("src", "dst") // includes a duplicate edge and a self-loop

  test("outDegree counts duplicate edges (raw multiset semantics)") {
    val d = GraphOps.outDegree(tiny).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 3, 1L -> 2, 2L -> 1, 4L -> 1))
  }

  test("edgeUpper canonicalizes, dedupes, drops self-loops") {
    val e = GraphOps.edgeUpper(tiny).as[(Long, Long)].collect().toSet
    assert(e == Set((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 4L)))
  }

  test("vertexExtract returns distinct endpoint set") {
    val v = GraphOps.vertexExtract(tiny).as[Long].collect().toSet
    assert(v == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("neighbors digests sorted adjacency with duplicates") {
    val n = GraphOps.neighbors(tiny).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(n(0L) == "1,1,2") // duplicate (0,1) kept, sorted
  }

  test("connected components: two components plus isolated self-loop") {
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (9L, 9L)).toDF("src", "dst")
    val cc = ConnectedComponents.run(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(0L -> 0, 1L -> 0, 2L -> 0, 5L -> 5, 6L -> 5, 9L -> 9))
  }

  test("connected components converge in O(log n) rounds on a long chain") {
    // tailThreshold = 0 pins the PURE distributed star loop (the default
    // cutover would finish a 999-edge chain in the one-task union-find)
    val n = 1000
    val chain = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val (comp, rounds) = ConnectedComponents.runCounted(spark, chain,
      tailThreshold = 0)
    assert(rounds <= 15, s"expected O(log n) star rounds on a $n-chain, got $rounds")
    val c = comp.agg(countDistinct("comp"), count(lit(1))).head()
    assert(c.getLong(0) == 1 && c.getLong(1) == n)
    assert(comp.agg(max("comp")).head().getLong(0) == 0L, "root must be the min id")
  }

  test("connected components refuse a maxIter bailout instead of emitting garbage") {
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.run(spark, edges, maxIter = 0, tailThreshold = 0)
        .collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connected components: union-find cutover is identical to the star loop") {
    val rnd = new scala.util.Random(59)
    val edges = Seq.fill(400)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val chain = (200L until 290L).map(i => (i, i + 1))
    for ((es, label) <- Seq((edges, "random"), (chain, "chain"),
        (edges ++ chain, "mixed"))) {
      val df = es.toDF("src", "dst")
      def cc(t: Int) = ConnectedComponents.run(spark, df, tailThreshold = t)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = cc(0)
      assert(cc(4096) == dist, s"$label: union-find cutover diverged")
    }
  }

  test("sssp unit-weight BFS distances on a diamond with a shortcut") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (0L, 4L))
      .toDF("src", "dst")
    val d = ShortestPaths.run(spark, edges, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d == Map(0L -> 0.0, 1L -> 1.0, 2L -> 1.0, 3L -> 2.0, 4L -> 1.0))
  }

  test("sssp honors explicit weights") {
    val edges = Seq((0L, 1L, 10.0), (0L, 2L, 1.0), (2L, 1L, 2.0))
      .toDF("src", "dst", "weight")
    val d = ShortestPaths.run(spark, edges, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d == Map(0L -> 0.0, 1L -> 3.0, 2L -> 1.0))
  }

  test("k-core peels cascades: pendant chain collapses, clique survives") {
    // 4-clique (0-3) with a chain 3-4-5 hanging off it: the 2-core must
    // peel 5 (deg 1), THEN 4 (deg drops to 1) — a 2-round cascade —
    // and keep the clique at its internal degrees.
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val edges = (clique ++ Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    val core = KCore.run(spark, edges, k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"expected the bare 4-clique, got $core")
    // k above the max degree empties the core after full cascade
    assert(KCore.run(spark, edges, k = 5).isEmpty)
    // brute-force cross-check on a random graph
    val rnd0 = new scala.util.Random(13)
    val re = Seq.fill(150)((rnd0.nextInt(30).toLong, rnd0.nextInt(30).toLong))
    val got = KCore.run(spark, re.toDF("src", "dst"), k = 6)
      .as[(Long, Long)].collect().toMap
    var es = re.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val bad = deg.filter(_._2 < 6).keySet
      changed = bad.nonEmpty
      es = es.filterNot(e => bad(e._1) || bad(e._2))
    }
    val expected = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    assert(got == expected)
  }

  test("triangle enumeration matches brute force on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val got = Triangles.run(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet
    // brute force on the simple undirected graph
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val verts = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      a <- verts; b <- verts if a < b && simple((a, b))
      c <- verts if b < c && simple((b, c)) && simple((a, c))
    } yield (a, b, c)).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "test graph should contain triangles")
  }

  test("rmat generation is deterministic and in-range") {
    val a = RMat.generate(spark, 6, 300, seed = 5).as[(Long, Long)].collect().toSet
    val b = RMat.generate(spark, 6, 300, seed = 5).as[(Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall { case (s, d) => s >= 0 && s < 64 && d >= 0 && d < 64 })
    val c = RMat.generate(spark, 6, 300, seed = 6).as[(Long, Long)].collect().toSet
    assert(a != c, "different seed should give a different graph")
  }

  test("transitivity: 1 on a clique, 0 on a star, hand value on the kite") {
    def t(edges: Seq[(Long, Long)]): (Long, Long, Double) = {
      val df = edges.toDF("src", "dst")
      GraphOps.transitivity(df, Triangles.run(df))
        .as[(Long, Long, Double)].head()
    }
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(t(k4) == ((4L, 12L, 1.0)))          // 4 triangles, 12 wedges
    val star = (1L to 4L).map(v => (0L, v))
    assert(t(star) == ((0L, 6L, 0.0)))
    // triangle plus a pendant edge: 1 triangle, 5 wedges
    val kite = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    assert(t(kite) == ((1L, 5L, 3.0 / 5.0)))
  }

  test("reciprocity counts mutual simple-edge pairs") {
    // 0→1 and 1→0 mutual; 1→2 one-way; dup and self-loop ignored
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (1L, 2L), (2L, 2L))
      .toDF("src", "dst")
    val (n, r, f) = GraphOps.reciprocity(e).as[(Long, Long, Double)].head()
    assert((n, r, f) == ((3L, 2L, 2.0 / 3.0)))
  }

  test("assortativity: -1 on a star, +1 on disjoint uniform cliques") {
    val star = (1L to 5L).map(v => (0L, v)).toDF("src", "dst")
    val s = GraphOps.assortativity(star)
      .select("assortativity").as[Double].head()
    assert(s == -1.0)
    // two disjoint triangles: every endpoint degree 2 -> degenerate
    // (zero variance) reports 0 by convention
    val tris = Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("src", "dst")
    val u = GraphOps.assortativity(tris)
      .select("assortativity").as[Double].head()
    assert(u == 0.0)
  }

  test("incremental CC equals full recompute: merges, new vertices, no-ops") {
    // standing: {0,1,2} and {10,11} and {20}-selfloop; batch BRIDGES the
    // first two components (1-11), attaches a brand-new vertex (30-2),
    // adds a no-op internal edge (0-2), and a fully-new component (40-41)
    val standing = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 20L))
      .toDF("src", "dst")
    val batch = Seq((1L, 11L), (30L, 2L), (0L, 2L), (40L, 41L))
      .toDF("src", "dst")
    val standingCC = ConnectedComponents.run(spark, standing)
    val inc = ConnectedComponents.incremental(spark, standingCC, batch)
      .as[(Long, Long)].collect().toMap
    val full = ConnectedComponents.run(spark, standing.unionAll(batch))
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(11L) == 0L && inc(30L) == 0L && inc(40L) == 40L && inc(20L) == 20L)
  }

  test("incremental triangle count equals full recount across k=1/2/3 cases") {
    // standing: square 0-1-2-3 with one diagonal (one triangle 0,1,2).
    // batch: (1,3) closes k=1 triangles via standing edges; (4,5),(5,6),
    // (4,6) an all-new k=3 triangle; (0,7),(7,1) a k=2 pair closed by
    // standing (0,1); plus a dup of a standing edge (no-op).
    val standing = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
      .toDF("src", "dst")
    val batch = Seq((1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (0L, 7L),
      (7L, 1L), (0L, 1L)).toDF("src", "dst")
    val r = Triangles.incrementalCount(standing, batch).head()
    val full = Triangles.run(standing.unionAll(batch)).count()
    val st = Triangles.run(standing).count()
    assert(r.getAs[Long]("tri_standing") == st)
    assert(r.getAs[Long]("tri_total") == full)
    assert(r.getAs[Long]("tri_delta") == full - st)
  }

  test("weighted PageRank with constant power-of-two weights equals unweighted EXACTLY") {
    // w = 2 everywhere: (old_pr·2)/(2·outdeg) = old_pr/outdeg in exact
    // IEEE arithmetic (×2 and ÷2 are lossless), so the weighted
    // recurrence must reproduce runFixed bit-for-bit — a stronger check
    // than any tolerance
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
      .toDF("src", "dst")
    val unweighted = PageRank.runFixed(spark, edges, websize = 5L, iterations = 4)
    val weighted = PageRank.runFixedWeighted(spark,
      edges.withColumn("w", lit(2L)), websize = 5L, iterations = 4)
    assert(weighted.exceptAll(unweighted).isEmpty &&
      unweighted.exceptAll(weighted).isEmpty)
    // and NON-uniform weights genuinely change the ranking: all of 1's
    // mass comes from 0; tilt 0's out-weights toward 2 and vertex 1
    // must lose rank. Vertex 2's rank is PARITY-dependent (the tilt
    // tightens the 0↔2 cycle, so at even iteration counts the extra
    // mass has bounced back to 0 — hand-unrolled: tilted pr₂=0.2715 <
    // uniform 0.4133 at iter 4, but 0.795 > 0.455 at iter 1), so the
    // monotone assertions are on vertex 1 (down) and vertex 0 (up).
    val tilted = PageRank.runFixedWeighted(spark,
      edges.withColumn("w",
        when(col("src") === 0 && col("dst") === 2, lit(9L)).otherwise(lit(1L))),
      websize = 5L, iterations = 4)
    def rankOf(df: org.apache.spark.sql.DataFrame, id: Long): Double =
      df.where(col("id") === id).head().getDouble(1)
    assert(rankOf(tilted, 1L) < rankOf(unweighted, 1L))
    assert(rankOf(tilted, 0L) > rankOf(unweighted, 0L))
    // odd parity: one iteration, the tilted 0→2 edge carries 0.9 of
    // the seed mass instead of 0.5 — vertex 2 must be ahead here
    val t1 = PageRank.runFixedWeighted(spark,
      edges.withColumn("w",
        when(col("src") === 0 && col("dst") === 2, lit(9L)).otherwise(lit(1L))),
      websize = 5L, iterations = 1)
    val u1 = PageRank.runFixed(spark, edges, websize = 5L, iterations = 1)
    assert(rankOf(t1, 2L) > rankOf(u1, 2L))
  }

  test("incremental triangle count accepts a MAINTAINED standing count") {
    // the steady-state refresh shape (ADVICE r8): the caller passes the
    // count it has been carrying — no run(standing) re-enumeration —
    // and the result must equal the bootstrap overload's
    val standing = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
      .toDF("src", "dst")
    val batch = Seq((1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    // maintained count: the standing square+diagonal holds TWO
    // triangles — (0,1,2) and (0,2,3)
    val carried = Seq(Tuple1(2L)).toDF("tri_standing")
    val viaCarried = Triangles.incrementalCount(standing, batch, carried).head()
    val viaBootstrap = Triangles.incrementalCount(standing, batch).head()
    assert(viaCarried == viaBootstrap)
    assert(viaCarried.getAs[Long]("tri_total") ==
      Triangles.run(standing.unionAll(batch)).count())
  }

  test("incremental triangle count on a seeded random graph equals full recount") {
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val (st, ba) = edges.partition { case (a, b) => (a + b) % 4 != 0 }
    val r = Triangles
      .incrementalCount(st.toDF("src", "dst"), ba.toDF("src", "dst")).head()
    val full = Triangles.run(edges.toDF("src", "dst")).count()
    assert(r.getAs[Long]("tri_total") == full)
  }

  test("incremental CC with a seeded random graph equals full recompute") {
    val rnd = new scala.util.Random(1234)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val (st, ba) = edges.partition { case (a, b) => (a + b) % 5 != 0 }
    val standingCC = ConnectedComponents.run(spark, st.toDF("src", "dst"))
    val inc = ConnectedComponents
      .incremental(spark, standingCC, ba.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val full = ConnectedComponents
      .run(spark, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
  }

  test("warm-start runFixed on an unchanged graph equals the cold run at round 9") {
    // cold iterations 2..5 normalize each step (iter > 0), and a warm
    // continuation normalizes from ITS first step — so splitting a
    // 5-iteration run at any j >= 1 computes the same math. Equality is
    // at the family's round-9 convention, not raw bits: the init path
    // re-partitions the carried vector, so the Σpr aggregates fold in a
    // different order (last-ulp reassociation only).
    val edges = graft.io.Tables.edges(spark, "/root/testdata/sf0.001")
    def r9(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), round(col("rank"), 9).as("rank"))
    val cold = r9(PageRank.runFixed(spark, edges, graft.io.Tables.GraphN,
      iterations = 5))
    for (j <- Seq(1, 3)) {
      val head = PageRank.runFixed(spark, edges, graft.io.Tables.GraphN,
        iterations = j)
      val warm = r9(PageRank.runFixed(spark, edges, graft.io.Tables.GraphN,
        iterations = 5 - j, init = Some(head)))
      assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
        s"split at $j diverged from the cold 5-iteration run")
    }
  }

  test("warm-start runPersonalized splits a cold run the same way") {
    // the personalized mirror of the split identity: restart mass
    // stays on the seeds across the split
    val edges = graft.io.Tables.edges(spark, "/root/testdata/sf0.001")
    val seeds = Seq(3L, 7L, 11L)
    def r9(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), round(col("rank"), 9).as("rank"))
    val cold = r9(PageRank.runPersonalized(spark, edges,
      graft.io.Tables.GraphN, seeds, iterations = 5))
    for (j <- Seq(1, 3)) {
      val head = PageRank.runPersonalized(spark, edges,
        graft.io.Tables.GraphN, seeds, iterations = j)
      val warm = r9(PageRank.runPersonalized(spark, edges,
        graft.io.Tables.GraphN, seeds, iterations = 5 - j,
        init = Some(head)))
      assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
        s"personalized split at $j diverged from the cold 5-iteration run")
    }
  }

  test("warm-start runFixedWeighted splits a cold run the same way") {
    // the weighted mirror of the split identity above: cold(5) ==
    // cold(j) continued warm(5-j) on the unchanged weighted graph
    val edges = graft.io.Tables.edges(spark, "/root/testdata/sf0.001")
      .withColumn("w", lit(1L) + (col("src") + col("dst")) % 5)
    def r9(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), round(col("rank"), 9).as("rank"))
    val cold = r9(PageRank.runFixedWeighted(spark, edges,
      graft.io.Tables.GraphN, iterations = 5))
    for (j <- Seq(1, 3)) {
      val head = PageRank.runFixedWeighted(spark, edges,
        graft.io.Tables.GraphN, iterations = j)
      val warm = r9(PageRank.runFixedWeighted(spark, edges,
        graft.io.Tables.GraphN, iterations = 5 - j, init = Some(head)))
      assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
        s"weighted split at $j diverged from the cold 5-iteration run")
    }
  }
}
