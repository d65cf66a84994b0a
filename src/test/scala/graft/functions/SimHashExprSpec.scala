package graft.functions

import graft.testkit.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class SimHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused row-local sketch equals the packed aggregate form exactly") {
    val rnd = new scala.util.Random(31)
    val words = Vector("red", "green", "blue", "cyan", "teal", "plum", "gold")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val fused = Dedup.simHash(docs, col("doc_id"), col("text"))
    val agg = Dedup.simHashAgg(docs, col("doc_id"), col("text"))
    assert(fused.exceptAll(agg).isEmpty && agg.exceptAll(fused).isEmpty)
  }

  test("empty docs are dropped; parquet-backed table matches (codegen path)") {
    val edge = Seq((1L, ""), (2L, " "), (3L, "a")).toDF("doc_id", "text")
    val ids = Dedup.simHash(edge, col("doc_id"), col("text"))
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(3L))
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fused = Dedup.simHash(d, col("doc_id"), col("text"))
    val agg = Dedup.simHashAgg(d, col("doc_id"), col("text"))
    assert(fused.exceptAll(agg).isEmpty && agg.exceptAll(fused).isEmpty)
  }
}
