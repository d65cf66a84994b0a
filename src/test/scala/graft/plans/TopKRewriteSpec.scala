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

  test("rn = 1 rewrites; rank kept in output or rank() do not") {
    val one = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    assert(hasTopK(one))
    assert(one.collect().length == 37)

    val kept = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3) // rn stays in the output
    assert(!hasTopK(kept), "must not rewrite when the rank column survives")

    val rank = df.withColumn("rn", org.apache.spark.sql.functions.rank().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(!hasTopK(rank), "rank() has different tie semantics — no rewrite")
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
