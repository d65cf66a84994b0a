package graft.graph

import graft.testkit.SparkSpec
import graft.functions.Hashing

class ColoringSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential greedy coloring in ascending (hash60(seed,v), v) order —
    * the fixpoint JP must reproduce. */
  private def greedy(edges: Seq[(Long, Long)], seed: Long): Map[Long, Long] = {
    val und = edges.filter { case (a, b) => a != b }
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    val order = verts.sortBy(v => (Hashing.hash60Local(s"$seed|$v"), v))
    val color = scala.collection.mutable.Map[Long, Long]()
    for (v <- order) {
      val taken = und.getOrElse(v, Set.empty).flatMap(color.get)
      color(v) = Iterator.iterate(0L)(_ + 1).find(c => !taken(c)).get
    }
    color.toMap
  }

  private def assertProper(edges: Seq[(Long, Long)], col: Map[Long, Long]): Unit =
    for ((a, b) <- edges if a != b)
      assert(col(a) != col(b), s"edge ($a,$b) monochromatic: ${col(a)}")

  test("matches sequential greedy on hand graphs") {
    for (edges <- Seq(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)),            // path
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (7L, 7L)),  // triangle+pendant+loop
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))) {          // star
      val got = Coloring.run(spark, edges.toDF("src", "dst"), seed = 13L)
        .as[(Long, Long)].collect().toMap
      assert(got === greedy(edges, 13L))
      assertProper(edges, got)
    }
  }

  test("matches greedy on a random graph, independent of partitioning") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = edges.toDF("src", "dst")
    val want = greedy(edges, 5L)
    val a = Coloring.run(spark, df, seed = 5L).as[(Long, Long)].collect().toMap
    val b = Coloring.run(spark, df.repartition(7), seed = 5L)
      .as[(Long, Long)].collect().toMap
    assert(a === want)
    assert(b === want)
    assertProper(edges, a)
  }

  test("negative vertex ids color correctly") {
    val edges = Seq((-5L, -1L), (-1L, 3L), (3L, -5L))
    val got = Coloring.run(spark, edges.toDF("src", "dst"), seed = 3L)
      .as[(Long, Long)].collect().toMap
    assert(got === greedy(edges, 3L))
    assertProper(edges, got)
  }

  test("chain converges in far fewer rounds than n (pure JP, no tail cutover)") {
    val edges = (0L until 600L).map(i => (i, i + 1))
    val (df, rounds) = Coloring.runCounted(spark, edges.toDF("src", "dst"),
      seed = 7L, tailThreshold = 0)
    val got = df.as[(Long, Long)].collect().toMap
    assert(got === greedy(edges, 7L))
    assert(rounds <= 40, s"chain took $rounds JP rounds — priority DAG not peeling")
  }

  test("tail cutover equals pure JP and the sequential reference (r13)") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(900)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val df = edges.toDF("src", "dst")
    val want = greedy(edges, 9L)
    // pure JP (threshold 0), all-tail (threshold > |V|), and a mid
    // cutover that runs some JP rounds THEN the bounded tail
    for (th <- Seq(0, 30, 1024)) {
      val got = Coloring.run(spark, df, seed = 9L, tailThreshold = th)
        .as[(Long, Long)].collect().toMap
      assert(got === want, s"tailThreshold=$th diverged from sequential greedy")
    }
  }
}
