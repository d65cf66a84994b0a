package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private lazy val target =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "text", "score")

  test("matched update / matched delete / not-matched insert / retain") {
    val source = Seq((2L, "B", "u"), (3L, "x", "d"), (5L, "E", "i"))
      .toDF("id", "text", "op")
    val got = MergeInto.mergeInto(target, source, "id",
      matchedDeleteWhen = Some(col("s_op") === "d"),
      matchedUpdate = Seq("text" -> col("s_text")),
      notMatchedInsert = Seq("id" -> col("s_id"), "text" -> col("s_text")))
      .as[(Long, String, Option[Int])].collect().sortBy(_._1)
    assert(got === Array(
      (1L, "a", Some(10)),  // not matched by source: retained
      (2L, "B", Some(20)),  // update: text set, score kept
      (4L, "d", Some(40)),  // retained (3 deleted)
      (5L, "E", None)))     // insert: unlisted score -> NULL
  }

  test("delete clause wins over update (SQL clause order)") {
    val source = Seq((2L, "B2", "d")).toDF("id", "text", "op")
    val got = MergeInto.mergeInto(target, source, "id",
      matchedDeleteWhen = Some(col("s_op") === "d"),
      matchedUpdate = Seq("text" -> col("s_text")))
      .select("id").as[Long].collect().sorted
    assert(got === Array(1L, 3L, 4L)) // 2 deleted, never updated
  }

  test("no delete clause: pure upsert") {
    val source = Seq((1L, "A", "u"), (9L, "I", "i")).toDF("id", "text", "op")
    val got = MergeInto.mergeInto(target, source, "id",
      matchedUpdate = Seq("text" -> col("s_text"),
        "score" -> (col("t_score") + 1)),
      notMatchedInsert = Seq("id" -> col("s_id"), "text" -> col("s_text"),
        "score" -> lit(0)))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(got === Array((1L, "A", 11), (2L, "b", 20), (3L, "c", 30),
      (4L, "d", 40), (9L, "I", 0)))
  }

  test("conditional insert makes batch re-application a no-op") {
    val source = Seq((2L, "B", "u"), (3L, "x", "d"), (5L, "E", "i"))
      .toDF("id", "text", "op")
    def applyBatch(t: org.apache.spark.sql.DataFrame) =
      MergeInto.mergeInto(t, source, "id",
        matchedDeleteWhen = Some(col("s_op") === "d"),
        matchedUpdate = Seq("text" -> col("s_text")),
        notMatchedInsert = Seq("id" -> col("s_id"), "text" -> col("s_text")),
        notMatchedInsertWhen = Some(col("s_op") =!= "d"))
    val once = applyBatch(target).as[(Long, String, Option[Int])]
      .collect().toSet
    val twice = applyBatch(applyBatch(target)).as[(Long, String, Option[Int])]
      .collect().toSet
    assert(twice === once) // deleted key 3 is NOT resurrected as an insert
    assert(!once.exists(_._1 == 3L))
  }

  test("containment pairs: excerpt found with containment 1.0, low Jaccard") {
    val docs = Seq(
      (1L, "beta gamma delta epsilon zeta"),                // excerpt of 2
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight"))      // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      n = 3, r = 5, maxDf = 10)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (a, b, na, nb, ninter, cont, jac) = got.head
    assert((a, b, na, nb, ninter) === (1L, 2L, 3L, 8L, 3L))
    assert(cont === 1.0)       // every excerpt gram is in the container
    assert(jac === 0.375)      // 3 / (3 + 8 - 3): Jaccard alone missed it
  }
}
