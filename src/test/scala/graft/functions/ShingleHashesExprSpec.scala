package graft.functions

import graft.testkit.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class ShingleHashesExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused shingle hashes equal hash60 over the composed shingle strings") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = TextAnalysis.explodedShingleHashes(d, col("doc_id"), col("text"), 3)
    val composed = TextAnalysis.explodedShingles(d, col("doc_id"), col("text"), 3)
      .select(col("doc_id"), Hashing.hash60(col("sh")).as("h"))
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty)
  }

  test("short docs emit no rows; n is honored") {
    val edge = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val h2 = TextAnalysis.explodedShingleHashes(edge, col("doc_id"), col("text"), 4)
    assert(h2.select("doc_id").as[Long].collect().toSeq == Seq(2L))
    val composed = TextAnalysis.explodedShingles(edge, col("doc_id"), col("text"), 4)
      .select(col("doc_id"), Hashing.hash60(col("sh")).as("h"))
    assert(h2.exceptAll(composed).isEmpty && composed.exceptAll(h2).isEmpty)
  }
}
