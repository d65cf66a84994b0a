package graft.functions

import graft.testkit.SparkSpec
import graft.pipeline.Similarity
import org.apache.spark.sql.functions._

class SqDistL2Spec extends SparkSpec {
  import spark.implicits._

  private def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    SqDistL2.sqDist(a, b)

  test("float arrays: native is bit-identical to the composed three-fold form") {
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 60)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val diffs = vecs.crossJoin(q).where(col("qid") < col("vec_id"))
      .select(native(col("qvec"), col("embedding")).as("n"),
        Similarity.sqDistComposed(col("qvec"), col("embedding")).as("c"))
      .where(col("n") =!= col("c")).count()
    assert(diffs == 0L)
  }

  test("double arrays: native is bit-identical to the composed three-fold form") {
    val rnd = new scala.util.Random(23)
    val vecs = (0 until 60)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val q = vecs.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val diffs = vecs.crossJoin(q).where(col("qid") < col("vec_id"))
      .select(native(col("qvec"), col("embedding")).as("n"),
        Similarity.sqDistComposed(col("qvec"), col("embedding")).as("c"))
      .where(col("n") =!= col("c")).count()
    assert(diffs == 0L)
  }

  test("known values, empty arrays, and mismatched lengths") {
    val d = Seq(
      (Array(1.0, 2.0), Array(1.0, 2.0)),   // identical → 0
      (Array(0.0, 0.0), Array(3.0, 4.0)))   // origin vs (3,4) → 25
      .toDF("a", "b")
      .select(native(col("a"), col("b")).as("d")).collect()
    assert(d(0).getDouble(0) == 0.0)
    assert(d(1).getDouble(0) == 25.0)
    val empty = Seq((Array.empty[Double], Array.empty[Double])).toDF("a", "b")
      .select(native(col("a"), col("b")).as("d")).head()
    assert(empty.getDouble(0) == 0.0)
    val mis = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
      .select(native(col("a"), col("b")).as("n"),
        Similarity.sqDistComposed(col("a"), col("b")).as("c")).head()
    assert(mis.isNullAt(0) && mis.isNullAt(1))
  }

  test("parquet-backed codegen path matches the composed form on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(native(col("qvec"), col("embedding")).as("n"),
        Similarity.sqDistComposed(col("qvec"), col("embedding")).as("c"))
      .where(col("n") =!= col("c")).count()
    assert(diffs == 0L)
  }
}
