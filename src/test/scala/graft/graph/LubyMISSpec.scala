package graft.graph

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class LubyMISSpec extends SparkSpec {
  import spark.implicits._

  /** Assert `mis` is a maximal independent set of `edges`. */
  private def assertMIS(edges: Seq[(Long, Long)], mis: Set[Long]): Unit = {
    val und = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val verts = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
    // independence
    for ((a, b) <- und) assert(!(mis(a) && mis(b)), s"edge ($a,$b) inside MIS")
    // maximality: every non-member has a member neighbor
    for (v <- verts -- mis)
      assert(und.exists { case (a, b) => a == v && mis(b) },
        s"vertex $v could be added — not maximal")
  }

  test("path graph MIS is maximal and independent") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val mis = LubyMIS.run(spark, edges.toDF("src", "dst"), seed = 3L)
      .as[Long].collect().toSet
    assertMIS(edges, mis)
  }

  test("triangle with pendant and isolated-by-self-loop vertex") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (7L, 7L))
    val mis = LubyMIS.run(spark, edges.toDF("src", "dst"), seed = 1L)
      .as[Long].collect().toSet
    assertMIS(edges, mis)
    assert(mis(7L), "self-loop-only vertex is independent — must be included")
  }

  test("1000-vertex chain converges in O(log n)-ish rounds, not O(n)") {
    // tailThreshold = 0 pins the PURE distributed regime (the default
    // cutover would finish a 1000-vertex graph in the sequential tail)
    val edges = (0L until 999L).map(i => (i, i + 1))
    val (mis, rounds) = LubyMIS.runCounted(spark, edges.toDF("src", "dst"),
      seed = 13L, tailThreshold = 0)
    val got = mis.as[Long].collect().toSet
    assertMIS(edges, got)
    assert(rounds <= 25, s"chain took $rounds rounds — frontier not shrinking")
  }

  test("sequential tail cutover is bit-identical to the distributed regime") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val chain = (100L until 160L).map(i => (i, i + 1))
    for ((es, label) <- Seq((edges, "random"), (chain, "chain"),
        (edges ++ chain, "mixed"))) {
      val df = es.toDF("src", "dst")
      val dist = LubyMIS.run(spark, df, seed = 11L, tailThreshold = 0)
        .as[Long].collect().toSet
      val tail = LubyMIS.run(spark, df, seed = 11L, tailThreshold = 4096)
        .as[Long].collect().toSet
      // mid-flight cutover: a few distributed rounds, then the tail
      val mid = LubyMIS.run(spark, df, seed = 11L, tailThreshold = 16)
        .as[Long].collect().toSet
      assert(dist == tail, s"$label: full-tail regime diverged")
      assert(dist == mid, s"$label: mid-flight cutover diverged")
      assertMIS(es, dist)
    }
  }

  test("deterministic per seed, and converges on a denser graph") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = edges.toDF("src", "dst")
    val a = LubyMIS.run(spark, df, seed = 9L).as[Long].collect().toSet
    val b = LubyMIS.run(spark, df.repartition(7), seed = 9L).as[Long].collect().toSet
    assert(a == b, "MIS must be partitioning-independent")
    assertMIS(edges, a)
  }
}
