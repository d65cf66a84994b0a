package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** The opt-in approx-distinct rewrite: off by default (exact results),
  * accurate within HLL bounds when on, null semantics preserved, and
  * scoped to exactly the single-argument unfiltered form. */
class ApproxDistinctRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try f finally spark.conf.unset(ApproxDistinctRewrite.ConfKey)
  }

  private def df = spark.range(200000L)
    .select((col("id") % 5L).as("g"), (col("id") % 50000L).as("x"))

  test("off by default: count distinct stays exact") {
    val q = df.groupBy("g").agg(countDistinct("x").as("d"))
    assert(q.collect().forall(_.getLong(1) == 10000L))
    assert(!q.queryExecution.executedPlan.toString.contains("hll60("),
      "rule fired without opt-in")
  }

  test("opted in: one-exchange sketch within HLL error bounds") {
    withRule {
      val q = df.groupBy("g").agg(countDistinct("x").as("d"))
      val plan = q.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("hll60("), s"rewrite did not fire:\n$plan")
      q.collect().foreach { r =>
        val est = r.getLong(1).toDouble
        // 256 registers -> 1.04/sqrt(256) ~ 6.5% standard error; the
        // deterministic estimate here lands ~10% off -> bound at 2.5 sigma
        assert(math.abs(est - 10000.0) / 10000.0 < 0.16,
          s"estimate $est too far from 10000")
      }
      // null semantics: NULLs are not counted, matching COUNT(DISTINCT)
      val withNulls = Seq(Some(1L), Some(2L), None, Some(2L)).toDF("x")
      val est = withNulls.agg(countDistinct("x")).head().getLong(0)
      assert(est == 2L, s"null handling diverged: $est")
    }
  }

  test("filtered and multi-argument distincts are left exact") {
    withRule {
      val multi = df.agg(countDistinct(col("g"), col("x")).as("d"))
      assert(!multi.queryExecution.executedPlan.toString.contains("hll60("))
      assert(multi.head().getLong(0) == 50000L)
      df.createOrReplaceTempView("adr_src")
      val filtered = spark.sql(
        "SELECT count(DISTINCT x) FILTER (WHERE g = 1) FROM adr_src")
      assert(!filtered.queryExecution.executedPlan.toString.contains("hll60("))
      assert(filtered.head().getLong(0) == 10000L)
    }
  }
}
