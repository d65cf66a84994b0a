package graft.pipeline

import org.apache.spark.sql.functions._
import graft.functions.Hashing
import graft.testkit.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("no false negatives: every inserted value probes true") {
    val vals = (0L until 200L).map(i => (i, s"doc body $i"))
    val df = docsDf(vals)
    val hashed = df.select(col("doc_id"), Hashing.hash60(col("text")).as("h"))
    val filt = Bloom.build(hashed, col("h"), mBits = 512, k = 3, seed = 5L)
    val probed = Bloom.mayContain(filt, hashed, col("doc_id"), col("h"),
      mBits = 512, k = 3, seed = 5L)
    assert(probed.where(!col("maybe_seen")).count() === 0L)
  }

  test("definite-miss exists at sane fill, and misses are true misses") {
    val inserted = docsDf((0L until 50L).map(i => (i, s"in $i")))
      .select(col("doc_id"), Hashing.hash60(col("text")).as("h"))
    val others = docsDf((1000L until 1400L).map(i => (i, s"out $i")))
      .select(col("doc_id"), Hashing.hash60(col("text")).as("h"))
    val filt = Bloom.build(inserted, col("h"), mBits = 4096, k = 3, seed = 5L)
    val probed = Bloom.mayContain(filt, others, col("doc_id"), col("h"),
      mBits = 4096, k = 3, seed = 5L)
    val nMiss = probed.where(!col("maybe_seen")).count()
    // kn/m = 150/4096 fill → FP rate ~(0.036)^3; nearly all 400 miss
    assert(nMiss > 350L, s"expected mostly definite misses, got $nMiss")
    assert(probed.count() === 400L)
  }

  test("exactIncrementalBloom equals exactIncremental row-for-row") {
    // overlapping corpora: new batch shares half its texts with existing
    val existing = docsDf((0L until 120L).map(i => (i, s"text ${i % 80}")))
    val incoming = docsDf((500L until 700L).map(i => (i, s"text ${i % 160}")))
    val plain = Dedup.exactIncremental(incoming, existing, col("doc_id"), col("text"))
    // tiny filter on purpose: false positives guaranteed, result must not change
    val bloomed = Bloom.exactIncrementalBloom(incoming, existing,
      col("doc_id"), col("text"), mBits = 256, k = 3, seed = 5L)
    val a = plain.orderBy("doc_id").collect().toSeq
    val b = bloomed.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("packed words match a driver-side reference filter") {
    val vals = (0L until 64L).map(i => (i, s"w $i"))
    val hashed = docsDf(vals).select(col("doc_id"), Hashing.hash60(col("text")).as("h"))
    val m = 256; val k = 3; val seed = 9L
    val got = Bloom.build(hashed, col("h"), m, k, seed)
      .as[(Long, Long)].collect().toMap
    // reference: replay hash60(seed+j, hash60(text)) % m in plain JVM
    val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((_, t) <- vals; j <- 0 until k) {
      val hv = Hashing.hash60Local(t)
      val pos = Hashing.hash60Local(s"${seed + j}|$hv") % m
      val w = pos / 32
      expected(w) = expected(w) | (1L << (pos % 32).toInt)
    }
    assert(got === expected.toMap)
  }
}
