package graft.text

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe learns the classic low/lower/newest merges in order") {
    // Sennrich et al. 2016 running example: counts chosen so the merge
    // order is unambiguous.
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, corpus.mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, col("text"), nMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 ... (l,o)=7
    // lexicographic tie-break among count-9 pairs -> (e,s) first, then
    // (es,t)=9, then (est,</w>)=9, then (l,o)=7
    assert(merges.map(m => (m.a, m.b)) == Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.Eow), ("l", "o")))
  }

  test("bpe tokenize applies merges in training order") {
    val docs = Seq((1L, "low low lowest")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge("l", "o"), Bpe.Merge("lo", "w"),
      Bpe.Merge("low", Bpe.Eow))
    val out = Bpe.tokenize(spark, docs, col("doc_id"), col("text"), merges)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(out == Seq("low</w>", "low</w>", "low", "e", "s", "t", Bpe.Eow))
  }

  test("bpe training is partitioning-independent") {
    val text = (1 to 50).map(i => s"alpha beta gamma delta w$i").mkString(" ")
    val one = Seq((1L, text)).toDF("doc_id", "text").coalesce(1)
    val many = Seq((1L, text)).toDF("doc_id", "text").repartition(8)
    val m1 = Bpe.train(spark, one, col("text"), 6)
    val m2 = Bpe.train(spark, many, col("text"), 6)
    assert(m1 == m2)
  }

  test("bpe stops when no pair repeats") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, col("text"), nMerges = 10)
    assert(merges.isEmpty) // every pair occurs once -> count < 2 -> stop
  }
}
