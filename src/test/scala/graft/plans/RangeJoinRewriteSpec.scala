package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The keyless-range-join binning rule must (1) remove the nested-loop
  * join whenever it fires, (2) change NO rows relative to the naive
  * plan — including strict bounds, degenerate (reversed) intervals and
  * negative values straddling bucket 0 of truncating `div` — and
  * (3) refuse every shape it cannot prove: equi-joins, non-integral
  * range columns, outer joins, missing conf. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val Key = RangeJoinRewrite.ConfKey

  private def withWidth[T](w: String)(f: => T): T = {
    val prev = spark.conf.getOption(Key)
    if (w.isEmpty) spark.conf.unset(Key) else spark.conf.set(Key, w)
    try f finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  private def joins(df: DataFrame): Seq[SparkPlan] =
    PlanWalk.nodes(df.queryExecution.executedPlan).filter {
      case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec |
           _: SortMergeJoinExec | _: ShuffledHashJoinExec |
           _: BroadcastHashJoinExec => true
      case _ => false
    }

  private def isLoop(p: SparkPlan): Boolean = p match {
    case _: BroadcastNestedLoopJoinExec | _: CartesianProductExec => true
    case _ => false
  }

  private val l = Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, 30L, 28L),
    (4L, -12L, -3L)).toDF("lid", "ls", "le") // lid 3 reversed, lid 4 negative
  private val r = Seq((10L, 5L, 7L), (11L, 24L, 40L), (12L, 29L, 29L),
    (13L, 100L, 200L), (14L, -5L, -1L)).toDF("rid", "rs", "re")

  private def overlap = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
    .select("lid", "rid")

  private def pairs(df: DataFrame): Seq[(Long, Long)] =
    df.as[(Long, Long)].collect().toSeq.sorted

  test("fires: nested loop becomes an equi-join with identical rows") {
    val naive = withWidth("")(pairs(overlap))
    assert(withWidth("")(joins(overlap).exists(isLoop)),
      "baseline should be a nested-loop join")
    for (w <- Seq("1", "3", "7", "1000")) {
      withWidth(w) {
        val js = joins(overlap)
        assert(js.nonEmpty && js.forall(!isLoop(_)),
          s"w=$w: loop join survived: $js")
        assert(pairs(overlap) == naive, s"w=$w: rows differ from naive plan")
      }
    }
    // the hand-checkable subset: reversed lid=3 [30,28] overlaps rid=12
    // {29} under the raw predicate (30<=29 false) — wait: ls=30 <= re=29
    // is FALSE, so (3,12) must NOT appear; lid=3 matches rid=11 ([24,40]:
    // 30<=40 && 24<=28). Negative lid=4 [-12,-3] matches rid=14 [-5,-1].
    assert(naive.contains((3L, 11L)) && !naive.contains((3L, 12L))
      && naive.contains((4L, 14L)) && naive.contains((1L, 10L)))
  }

  test("strict bounds survive the rewrite exactly") {
    val strict = l.join(r, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid")
    val naive = withWidth("")(pairs(strict))
    withWidth("5") {
      assert(joins(strict).forall(!isLoop(_)))
      assert(pairs(strict) == naive)
    }
  }

  test("point-in-interval form fires and matches") {
    val pts = Seq((100L, 6L), (101L, 26L), (102L, -4L), (103L, 55L))
      .toDF("pid", "p")
    val q = l.join(pts, col("p") >= col("ls") && col("p") <= col("le"))
      .select("lid", "pid")
    val naive = withWidth("")(pairs(q))
    assert(naive == Seq((1L, 100L), (4L, 102L))) // 26 and 55 hit no interval
    withWidth("10") {
      assert(joins(q).forall(!isLoop(_)))
      assert(pairs(q) == naive)
    }
  }

  test("randomized: equality with the naive plan on every width") {
    val rnd = new scala.util.Random(42)
    def mk(n: Int, tag: String) = (0 until n).map { i =>
      val a = rnd.nextInt(400) - 200
      val b = a + rnd.nextInt(60) - 10 // ~1/6 reversed
      (i.toLong, a.toLong, b.toLong)
    }.toDF(s"${tag}id", s"${tag}s", s"${tag}e")
    val a = mk(80, "a"); val b = mk(90, "b")
    val q = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid")
    val naive = withWidth("")(pairs(q))
    assert(naive.nonEmpty)
    for (w <- Seq("1", "13", "64", "10000"))
      withWidth(w)(assert(pairs(q) == naive, s"w=$w diverged"))
  }

  test("refuses: equi conjunct, non-integral ranges, outer join, no conf") {
    withWidth("5") {
      // an equality between the sides -> Spark hash-joins already
      val equi = l.join(r, col("lid") === col("rid")
        && col("ls") <= col("re") && col("rs") <= col("le"))
      assert(joins(equi).forall(!isLoop(_))) // hash join, not our rewrite
      assert(PlanWalk.nodes(equi.queryExecution.executedPlan)
        .count { case _: org.apache.spark.sql.execution.GenerateExec => true
                 case _ => false } == 0, "rewrite fired despite equi key")
      // double-typed ranges: no bins possible, loop join stays
      val ld = l.select(col("lid"), col("ls").cast("double").as("ls"),
        col("le").cast("double").as("le"))
      val rd = r.select(col("rid"), col("rs").cast("double").as("rs"),
        col("re").cast("double").as("re"))
      val dbl = ld.join(rd, col("ls") <= col("re") && col("rs") <= col("le"))
      assert(joins(dbl).exists(isLoop), "rewrite fired on double ranges")
      // outer join: untouched
      val outer = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"),
        "left_outer")
      assert(joins(outer).exists(isLoop), "rewrite fired on an outer join")
    }
    // conf unset: untouched
    assert(withWidth("")(joins(overlap).exists(isLoop)))
  }
}
