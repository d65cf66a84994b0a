package graft.graph

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** TopoSort.levels = longest path ending at each vertex; level order is
  * a valid topological order; cycles are rejected, not looped on. */
class TopoSortSpec extends SparkSpec {
  import spark.implicits._

  private def lv(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TopoSort.levels(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("diamond and chain: hand-computed levels") {
    // 1 -> {2,3} -> 4, plus a long arm 1 -> 5 -> 6 -> 4: level(4) = 3
    val m = lv(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)))
    assert(m == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 1L,
      6L -> 2L, 4L -> 3L))
    // pure chain: level = position
    val c = lv(Seq((10L, 11L), (11L, 12L), (12L, 13L)))
    assert(c == Map(10L -> 0L, 11L -> 1L, 12L -> 2L, 13L -> 3L))
  }

  test("two roots: level counts the longest inbound path, not the first") {
    // 1 -> 3 and 2 -> 4 -> 3: level(3) must be 2 (via 2), not 1
    val m = lv(Seq((1L, 3L), (2L, 4L), (4L, 3L)))
    assert(m(3L) == 2L && m(1L) == 0L && m(2L) == 0L && m(4L) == 1L)
  }

  test("every edge goes strictly up a level (valid topological order)") {
    val edges = for {
      a <- 0L until 30L; b <- (a + 1) until 30L
      if ((a * 31 + b * 17) % 7) == 0 // deterministic sparse DAG (a < b)
    } yield (a, b)
    val m = lv(edges)
    edges.foreach { case (s, d) =>
      assert(m(s) < m(d), s"edge $s->$d does not ascend: ${m(s)} !< ${m(d)}")
    }
    // parity with the sequential DP over the id order (ids ascend)
    val dp = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    edges.sorted.foreach { case (s, d) => dp(d) = math.max(dp(d), dp(s) + 1) }
    // recompute until stable (edges sorted by src suffice since src < dst)
    m.keys.foreach { v => assert(m(v) == dp(v), s"vertex $v: ${m(v)} != ${dp(v)}") }
  }

  test("cycles and self-loops are rejected") {
    intercept[IllegalArgumentException] {
      lv(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    }
    intercept[IllegalArgumentException] { lv(Seq((1L, 1L))) }
  }
}
