package graft.graph

import graft.testkit.SparkSpec

/** Brandes betweenness dependencies: hand example, brute-force parity,
  * partitioning invariance of the sorted-fold float discipline. */
class BetweennessSpec extends SparkSpec {

  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)], srcs: Seq[Long])
      : Map[(Long, Long), (Long, Long, Double)] = {
    val adj = edges.filter(e => e._1 != e._2).groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2) }
    val out = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long, Double)]
    for (s <- srcs) {
      val dist = scala.collection.mutable.Map(s -> 0L)
      val sigma = scala.collection.mutable.Map(s -> 1L).withDefaultValue(0L)
      val levels = scala.collection.mutable.Map(0L -> Set(s))
      var frontier = Map(s -> 1L)
      var d = 0L
      while (frontier.nonEmpty) {
        val nxt = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((u, su) <- frontier; w <- adj.getOrElse(u, Nil) if !dist.contains(w))
          nxt(w) += su
        d += 1
        for ((w, sw) <- nxt) { dist(w) = d; sigma(w) = sw }
        if (nxt.nonEmpty) levels(d) = nxt.keySet.toSet
        frontier = nxt.toMap
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (dd <- (levels.keys.max - 1) to 0L by -1; v <- levels(dd)) {
        // same canonical order as the engine: sort terms by (w, term),
        // left-fold from 0.0
        val terms = adj.getOrElse(v, Nil)
          .filter(w => dist.get(w).contains(dd + 1))
          .map(w => (w, sigma(v).toDouble / sigma(w) * (1.0 + delta(w))))
          .sorted
        var acc = 0.0
        terms.foreach { case (_, t) => acc += t }
        delta(v) = acc
      }
      for ((v, dv) <- dist) out((s, v)) = (dv, sigma(v), delta(v))
    }
    out.toMap
  }

  test("dependencies match hand values on a path and a diamond") {
    // path 0→1→2→3: delta walks up 1, 2, 3; all sigma 1
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val gotPath = Betweenness.run(spark, path, Seq(0L))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    assert(gotPath == Map(0L -> (0L, 1L, 3.0), 1L -> (1L, 1L, 2.0),
      2L -> (2L, 1L, 1.0), 3L -> (3L, 1L, 0.0)), s"got $gotPath")
    // diamond 0→{1,2}→3: sigma(3)=2, delta(1)=delta(2)=1/2,
    // delta(0)=Σ 1·(1+1/2) over both branches = 3
    val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val gotD = Betweenness.run(spark, diamond, Seq(0L))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._2 -> (r._4, r._5)).toMap
    assert(gotD == Map(0L -> (1L, 3.0), 1L -> (1L, 0.5), 2L -> (1L, 0.5),
      3L -> (2L, 0.0)), s"got $gotD")
  }

  test("matches brute force bit-for-bit on a random multigraph") {
    val rnd = new scala.util.Random(53)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val srcs = Seq(3L, 17L, 42L)
    val got = Betweenness.run(spark, edges.toDF("src", "dst"), srcs)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val expected = brute(edges, srcs)
    assert(got.keySet == expected.keySet,
      s"coverage differs: ${got.keySet.size} vs ${expected.keySet.size}")
    for (k <- expected.keys) assert(got(k) == expected(k),
      s"at $k: got ${got(k)}, expected ${expected(k)}")
  }

  test("RK sample epsilon matches the closed form on the effdiam row") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(220)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val ed = NeighborhoodFunction.run(spark, edges.toDF("src", "dst"), 3)
    val effdiam = NeighborhoodFunction.effectiveDiameter(ed)
    val rc = effdiam.select("r_cross").as[Long].head()
    val k = 3
    val got = Betweenness.sampleEpsilon(effdiam, k)
      .as[(Long, Long, Double)].collect().toSeq
    val fl = 63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, rc + 1 - 2))
    val eps = BigDecimal(math.sqrt(
        (fl + 1.0 + Betweenness.LnInvDelta) / (2.0 * k)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((k.toLong, rc + 1, eps)))
    // more samples buy a tighter ε
    val eps10 = Betweenness.sampleEpsilon(effdiam, 10)
      .select("epsilon_est").as[Double].head()
    assert(eps10 < eps)
  }

  test("floats are partitioning-invariant (sorted fold)") {
    val rnd = new scala.util.Random(71)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val a = Betweenness.run(spark, edges.toDF("src", "dst"), Seq(5L, 11L))
      .as[(Long, Long, Long, Long, Double)].collect().sorted.toSeq
    val b = Betweenness.run(spark,
        scala.util.Random.shuffle(edges).toDF("src", "dst").repartition(17),
        Seq(5L, 11L))
      .as[(Long, Long, Long, Long, Double)].collect().sorted.toSeq
    assert(a == b)
  }
}
