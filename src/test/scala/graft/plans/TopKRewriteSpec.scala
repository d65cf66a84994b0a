package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The window-top-k optimizer rule: fires on the rn-idiom (and only
  * there), preserves results exactly, and honors its kill switch. */
class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def df = spark.range(10000L)
    .select((col("id") % 37L).as("k"), col("id").as("v"),
      (col("id") * 7 % 97).as("s"))

  private def hasTopK(q: DataFrame): Boolean = {
    q.collect()
    PlanWalk.nodes(q.queryExecution.executedPlan)
      .exists(_.isInstanceOf[TopKPerKeyExec])
  }

  private def w = Window.partitionBy("k").orderBy(col("s").desc, col("v"))

  test("rn <= k with the rank dropped rewrites to TopKPerKeyExec, same rows") {
    val q = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(hasTopK(q), "rewrite did not fire on the rn idiom")

    val (got, ref) = (q.collect().toSet, {
      val prev = spark.conf.getOption(TopKRewrite.ConfKey)
      spark.conf.set(TopKRewrite.ConfKey, "false")
      try {
        val r = df.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3).drop("rn")
        assert(!hasTopK(r), "kill switch ignored")
        r.collect().toSet
      } finally prev match {
        case Some(v) => spark.conf.set(TopKRewrite.ConfKey, v)
        case None => spark.conf.unset(TopKRewrite.ConfKey)
      }
    })
    assert(got == ref, "rewrite changed the result")
    assert(got.size == 37 * 3)
  }

  test("rn = 1 rewrites; rank kept in output or unprovable rank() do not") {
    val one = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    assert(hasTopK(one))
    assert(one.collect().length == 37)

    val kept = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3) // rn stays in the output
    assert(!hasTopK(kept), "must not rewrite when the rank column survives")

    // rank() with an order that is NOT provably unique (no distinctKeys
    // cover): ties would keep >k rows — must not rewrite. (v is unique
    // by construction here, but nothing in the plan proves it: exactly
    // the case the rule must refuse.)
    val rank = df.withColumn("rn", org.apache.spark.sql.functions.rank().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(!hasTopK(rank), "rank() without provable order uniqueness — no rewrite")
  }

  test("rank()/dense_rank() rewrite when distinctKeys prove the order unique — and not otherwise") {
    // Aggregate propagates distinctKeys {k1,k2}; PARTITION BY k1
    // ORDER BY k2 covers it, so within a partition the order is unique
    // and rank == row_number == dense_rank.
    val agg = df.select((col("k") % 5).as("k1"), col("k").as("k2"), col("v"))
      .groupBy("k1", "k2").agg(sum("v").as("sv"))
    val byK1 = Window.partitionBy("k1").orderBy(col("k2").desc)
    for (fn <- Seq(rank(), dense_rank())) {
      val q = agg.withColumn("rn", fn.over(byK1))
        .where(col("rn") <= 2).drop("rn")
      assert(hasTopK(q), s"rank-family rewrite did not fire on provably-unique order")
      assert(q.collect().toSet == {
        spark.conf.set(TopKRewrite.ConfKey, "false")
        try agg.withColumn("rn", fn.over(byK1))
          .where(col("rn") <= 2).drop("rn").collect().toSet
        finally spark.conf.unset(TopKRewrite.ConfKey)
      }, "rank-family rewrite changed the result")
    }
    // same aggregate but ORDER BY the non-key sv: ties possible — no fire
    val bySv = Window.partitionBy("k1").orderBy(col("sv").desc)
    val tied = agg.withColumn("rn", rank().over(bySv))
      .where(col("rn") <= 2).drop("rn")
    assert(!hasTopK(tied), "rank() over a tie-capable order must not rewrite")
  }

  test("compound filter: the rank conjunct rewrites, residual conjuncts re-apply after") {
    val q = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3 && col("v") % 2 === 0).drop("rn")
    assert(hasTopK(q), "conjunct-split rewrite did not fire")
    val ref = {
      spark.conf.set(TopKRewrite.ConfKey, "false")
      try df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3 && col("v") % 2 === 0).drop("rn").collect().toSet
      finally spark.conf.unset(TopKRewrite.ConfKey)
    }
    assert(q.collect().toSet == ref, "conjunct-split changed the result")

    // two rank conjuncts (a rank RANGE, not a top-k): leave untouched
    val band = df.withColumn("rn", row_number().over(w))
      .where(col("rn") >= 2 && col("rn") <= 3).drop("rn")
    assert(!hasTopK(band), "rank-range filter must not rewrite")
  }

  test("empty PARTITION BY (global top-k) plans as a limit, not TopKPerKey — and does not crash") {
    val wGlobal = Window.orderBy(col("s").desc, col("v"))
    val q = df.withColumn("rn", row_number().over(wGlobal))
      .where(col("rn") <= 5).drop("rn")
    val rows = q.collect() // planning must not throw
    assert(!hasTopK(q), "global top-k must use the limit plan, not TopKPerKey")
    assert(PlanWalk.nodes(q.queryExecution.executedPlan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "global top-k should plan as TakeOrderedAndProject")
    val ref = {
      spark.conf.set(TopKRewrite.ConfKey, "false")
      try df.withColumn("rn", row_number().over(wGlobal))
        .where(col("rn") <= 5).drop("rn").collect().toSet
      finally spark.conf.unset(TopKRewrite.ConfKey)
    }
    assert(rows.toSet == ref && rows.length == 5)
  }

  test("SQL-surface row_number idiom rewrites through the extension") {
    df.createOrReplaceTempView("topk_rewrite_src")
    val q = spark.sql(
      """SELECT k, v, s FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY s DESC, v) AS rn
        |  FROM topk_rewrite_src) WHERE rn <= 2""".stripMargin)
    assert(hasTopK(q), "SQL-path rewrite did not fire")
    assert(q.collect().length == 37 * 2)
  }
}
