package graft.text

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** The hashed-n-gram linear classifier's exact semantics: feature set =
  * unigrams + adjacent-word bigrams, bucket/weight arithmetic pinned to
  * hash60, empty docs score zero, and the whole thing is one shuffle-
  * free projection (the 100 TB scoring-path claim). */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextAnalysis.classify(texts.toSeq.toDF("doc_id", "text"),
      col("doc_id"), col("text"))

  test("feature count = unigrams + bigrams; empty and 1-token edge cases") {
    val rows = run((1L, "a b c"), (2L, "solo"), (3L, ""), (4L, "  "))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(rows(1L)._1 === 5L) // 3 unigrams + 2 bigrams
    assert(rows(2L)._1 === 1L)
    assert(rows(3L) === ((0L, 0L, false)))
    assert(rows(4L) === ((0L, 0L, false)))
  }

  test("score is the exact hash60 bag sum; keep is its sign") {
    import graft.functions.Hashing
    val grams = Seq("x y", "x", "y") // unigrams + the one bigram
    val expected = grams.map { g =>
      val b = spark.range(1).select(
        pmod(Hashing.hash60(concat(lit("clf|"), lit(g))),
          lit(TextAnalysis.ClassifyBuckets))).head().getLong(0)
      spark.range(1).select(
        Hashing.hash60(concat(lit("clfw|"), lit(b.toString))) % 2001L
          - 1000L).head().getLong(0)
    }.sum
    val r = run((9L, "x y")).collect().head
    assert(r.getLong(2) === expected)
    assert(r.getBoolean(3) === (expected > 0L))
  }

  test("scoring is one shuffle-free projection (no Exchange in the plan)") {
    val df = TextAnalysis.classify(
      spark.range(100).selectExpr("id AS doc_id",
        "concat('w', id % 7, ' w', id % 5) AS text"),
      col("doc_id"), col("text"))
    df.collect()
    assert(graft.plans.PlanWalk.nodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.Exchange]) === 0)
  }
}
