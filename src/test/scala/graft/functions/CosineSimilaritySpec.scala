package graft.functions

import graft.testkit.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("native expression is bit-identical to the composed-builtin form") {
    val a = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pairs = vecs.crossJoin(a).where(col("qid") < col("vec_id"))
    val diffs = pairs.select(
        Similarity.cosine(col("qvec"), col("embedding")).as("native"),
        Similarity.cosineComposed(col("qvec"), col("embedding")).as("composed"))
      .where(col("native") =!= col("composed"))
      .count()
    assert(diffs == 0L)
  }

  test("known values: identical=1, orthogonal=0, opposite=-1; zero vector is null") {
    val d = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 2f)),
      (Array(1f, 1f), Array(-1f, -1f)),
      (Array(1f, 0f), Array(0f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(d(0).get - 1.0) < 1e-12)
    assert(math.abs(d(1).get) < 1e-12)
    assert(math.abs(d(2).get + 1.0) < 1e-12)
    assert(d(3).isEmpty)
  }

  test("mismatched dimensions yield null (both eval paths), like the composed form") {
    val d = Seq((Array(1f, 0f, 1f), Array(1f, 0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("native"),
        Similarity.cosineComposed(col("a"), col("b")).as("composed"))
      .head()
    assert(d.isNullAt(0) && d.isNullAt(1))
    // parquet-backed to exercise the codegen path too
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.select(Similarity.cosine(
        slice(col("embedding"), 1, 8), col("embedding")).as("c"))
      .where(col("c").isNotNull).count()
    assert(n == 0L)
  }

  test("participates in whole-stage codegen (no CodegenFallback)") {
    // parquet-backed (a local relation would be constant-folded away)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = emb.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    // codegen'd operators print with the `*(stageId)` prefix
    val plan = df.queryExecution.executedPlan
    assert(plan.toString.contains("*(1) Project [cosinesimilarity"), plan.toString)
    assert(df.where(col("c").isNotNull).count() > 0) // executes the generated code
  }
}
