package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.GenerateExec
import graft.testkit.SparkSpec

/** FuzzyJoinRewrite: result equivalence against the un-rewritten plan
  * (including duplicate-row multiplicity and extra conjuncts), plan
  * shape (the nested loop is GONE, the blocking Generate is present),
  * and every guard (off by default, equi-conjunct skip, k cap, outer
  * joins untouched). */
class FuzzyJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // a catalog with spelling variants AND duplicate rows (multiplicity!)
  private val leftRows = Seq(
    "cold bolt", "cold bolt", "old bolt", "red gear", "widget", "zzz")
  private val rightRows = Seq(
    "old bolt", "bold bolt", "red gears", "red gears", "widge", "qqq")

  private def runSql(enabled: Boolean, sql: String): DataFrame = {
    val s2 = spark.newSession()
    s2.conf.set(FuzzyJoinRewrite.ConfKey, enabled.toString)
    leftRows.toDF("ln").createOrReplaceTempView("fz_left")
    rightRows.toDF("rn").createOrReplaceTempView("fz_right")
    // temp views are session-bound: re-register on the child session
    import s2.implicits._
    leftRows.toDF("ln").createOrReplaceTempView("fz_left")
    rightRows.toDF("rn").createOrReplaceTempView("fz_right")
    s2.sql(sql)
  }

  /** Materialize BEFORE reading the plan: executedPlan accessed without
    * an action optimizes under the THREAD's active-session conf, not the
    * child session's (actions wrap withActive(df.sparkSession); a bare
    * queryExecution does not) — caught when GraftExtensionsSpec ran
    * first and left a different active session on the thread. */
  private def materializedPlan(df: DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  private val JoinSql =
    """SELECT ln, rn, levenshtein(ln, rn) AS dist
      |FROM fz_left JOIN fz_right ON levenshtein(ln, rn) <= 2""".stripMargin

  test("rewrite preserves results exactly, duplicates included") {
    val off = runSql(enabled = false, JoinSql)
      .as[(String, String, Int)].collect().sorted.toSeq
    val on = runSql(enabled = true, JoinSql)
      .as[(String, String, Int)].collect().sorted.toSeq
    assert(off.nonEmpty && on == off)
    // duplicate left rows really do appear twice
    assert(on.count(r => r._1 == "cold bolt" && r._2 == "old bolt") == 2)
  }

  test("rewrite removes the nested loop and plans the blocking Generate") {
    val plan = materializedPlan(runSql(enabled = true, JoinSql))
    val nodes = PlanWalk.nodes(plan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(nodes.exists(_.isInstanceOf[GenerateExec]))
  }

  test("without the conf the nested loop stays (rule is opt-in)") {
    val plan = materializedPlan(runSql(enabled = false, JoinSql))
    assert(PlanWalk.nodes(plan).exists(p =>
      p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[CartesianProductExec]))
  }

  test("extra non-equi conjuncts keep their exact semantics") {
    val sql =
      """SELECT ln, rn FROM fz_left JOIN fz_right
        |ON levenshtein(ln, rn) <= 2 AND ln < rn""".stripMargin
    val off = runSql(enabled = false, sql)
      .as[(String, String)].collect().sorted.toSeq
    val on = runSql(enabled = true, sql)
      .as[(String, String)].collect().sorted.toSeq
    assert(on == off && on.forall { case (l, r) => l < r })
  }

  test("equi-conjunct joins are left untouched") {
    val sql =
      """SELECT ln, rn FROM fz_left JOIN fz_right
        |ON ln = rn AND levenshtein(ln, rn) <= 2""".stripMargin
    val plan = materializedPlan(runSql(enabled = true, sql))
    assert(!PlanWalk.nodes(plan).exists(_.isInstanceOf[GenerateExec]))
  }

  test("k above the supported cap is left untouched") {
    val sql =
      """SELECT ln, rn FROM fz_left JOIN fz_right
        |ON levenshtein(ln, rn) <= 4""".stripMargin
    val plan = materializedPlan(runSql(enabled = true, sql))
    assert(!PlanWalk.nodes(plan).exists(_.isInstanceOf[GenerateExec]))
  }

  test("strict < and reversed >= comparisons normalize and rewrite") {
    Seq(
      "levenshtein(ln, rn) < 3",  // == <= 2
      "2 >= levenshtein(ln, rn)").foreach { pred =>
      val sql = s"SELECT ln, rn FROM fz_left JOIN fz_right ON $pred"
      val off = runSql(enabled = false, sql)
        .as[(String, String)].collect().sorted.toSeq
      val q = runSql(enabled = true, sql)
      val plan = materializedPlan(q)
      assert(PlanWalk.nodes(plan)
        .exists(_.isInstanceOf[GenerateExec]), s"no rewrite for: $pred")
      assert(q.as[(String, String)].collect().sorted.toSeq == off)
    }
  }

  test("NULL keys drop out exactly as the original predicate drops them") {
    val s2 = spark.newSession()
    s2.conf.set(FuzzyJoinRewrite.ConfKey, "true")
    import s2.implicits._
    (leftRows :+ null).toDF("ln").createOrReplaceTempView("fz_ln")
    (rightRows :+ null).toDF("rn").createOrReplaceTempView("fz_rn")
    val on = s2.sql(
      "SELECT ln, rn FROM fz_ln JOIN fz_rn ON levenshtein(ln, rn) <= 2")
      .as[(String, String)].collect()
    assert(on.forall { case (l, r) => l != null && r != null })
  }

  test("native deletion neighborhood equals the column-composed one") {
    import org.apache.spark.sql.functions._
    val names = (leftRows ++ rightRows :+ "" :+ "x").toDF("n")
    val both = names.select(
        graft.functions.DeletionNeighborhoodFn
          .deletionNeighborhood(col("n"), 2).as("native"),
        graft.pipeline.FuzzyMatch.deletionNeighborhoodComposed(col("n"), 2)
          .as("composed"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (nat, comp) =>
      assert(nat.toSet == comp.toSet)
    }
  }
}
