package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** Epoch shuffle: positions are a permutation, shards balance to ±1,
  * the order is seed-reproducible across partitionings, and different
  * seeds genuinely reorder. */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Long) = spark.range(n).select(col("id").as("doc_id"))

  test("positions are a 0..n-1 permutation and shards balance to ±1") {
    val n = 1000L
    val out = Sampling.epochShuffle(spark, docs(n), col("doc_id"), seed = 3L,
      nShards = 8).cache()
    assert(out.count() == n)
    assert(out.agg(min("pos"), max("pos"), countDistinct("pos")).head()
      .toSeq == Seq(0L, n - 1, n))
    val sizes = out.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.max - sizes.values.min <= 1,
      s"shards unbalanced: $sizes")
    // pos_in_shard is dense 0..size-1 within each shard
    val dense = out.groupBy("shard").agg(max("pos_in_shard").as("m"),
      count(lit(1)).as("c")).where(col("m") =!= col("c") - 1)
    assert(dense.isEmpty)
    out.unpersist()
  }

  test("same seed reproduces the order under hostile partitioning; seeds differ") {
    val base = docs(500L)
    val a = Sampling.epochShuffle(spark, base.repartition(13), col("doc_id"),
      seed = 5L, nShards = 4).select("doc_id", "pos")
    val b = Sampling.epochShuffle(spark, base.repartition(2), col("doc_id"),
      seed = 5L, nShards = 4).select("doc_id", "pos")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "same seed must give identical positions regardless of partitioning")
    val c = Sampling.epochShuffle(spark, base, col("doc_id"), seed = 6L,
      nShards = 4).select("doc_id", "pos")
    val moved = a.join(c.withColumnRenamed("pos", "pos2"), "doc_id")
      .where(col("pos") =!= col("pos2")).count()
    assert(moved > 400, s"different seed barely reordered ($moved/500 moved)")
  }
}
