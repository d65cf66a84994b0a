package graft.functions

import graft.testkit.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class MinHashSigExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = {
    val rnd = new scala.util.Random(29)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    (0 until 200).map { i =>
      val n = rnd.nextInt(30) // includes docs shorter than the shingle width
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("fused row-local signatures equal the exploded aggregate form exactly") {
    val fused = Dedup.minHashSignatures(docs, col("doc_id"), col("text"))
    val agg = Dedup.minHashSignaturesAgg(docs, col("doc_id"), col("text"))
    assert(fused.count() == agg.count())
    assert(fused.exceptAll(agg).isEmpty && agg.exceptAll(fused).isEmpty)
  }

  test("short and empty docs are dropped, like the aggregate form") {
    val edge = Seq((1L, "one two"), (2L, ""), (3L, "a b c"), (4L, "  "))
      .toDF("doc_id", "text")
    val fused = Dedup.minHashSignatures(edge, col("doc_id"), col("text"))
    assert(fused.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("parquet-backed documents table matches the aggregate form (codegen path)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = Dedup.minHashSignatures(d, col("doc_id"), col("text"))
    val agg = Dedup.minHashSignaturesAgg(d, col("doc_id"), col("text"))
    assert(fused.exceptAll(agg).isEmpty && agg.exceptAll(fused).isEmpty)
  }
}
