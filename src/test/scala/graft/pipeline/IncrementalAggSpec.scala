package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** The refresh algebra the d_mv_inc gate can't exercise on clean data:
  * zero-count key drops, over-retraction detection, and the
  * maintained-state ≡ recompute identity under chained refreshes. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("refresh: inserts, retractions, zero-count drop — hand case") {
    val standing = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("k", "n", "total")
    // insert 2 rows into a, retract b's only row, open new key c
    val batch = Seq(
      ("a", 7L, false), ("a", 3L, false),
      ("b", 5L, true),
      ("c", 11L, false)).toDF("k", "m", "del")
    val out = IncrementalAgg.refresh(standing,
        IncrementalAgg.delta(batch, col("k"), col("m"), col("del")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map("a" -> ((4L, 40L)), "c" -> ((1L, 11L))))
    assert(!out.contains("b")) // dropped at zero, no tombstone
  }

  test("refresh raises on over-retraction instead of persisting a wrong aggregate") {
    val standing = Seq(("a", 1L, 10L)).toDF("k", "n", "total")
    val batch = Seq(("a", 10L, true), ("a", 10L, true)).toDF("k", "m", "del")
    val ex = intercept[Exception] {
      IncrementalAgg.refresh(standing,
        IncrementalAgg.delta(batch, col("k"), col("m"), col("del"))).collect()
    }
    assert(ex.getMessage.contains("count went negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("count went negative")))
  }

  test("chained refreshes equal a from-scratch recompute at sf0.001") {
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"),
        concat_ws("|", col("event_type"), col("user_id")).as("key"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // bootstrap on thirds, then two refreshes folding the rest in
    var mv = IncrementalAgg.bootstrap(
      e.where(col("event_id") % 3 === 0), col("key"), col("cents"))
      .localCheckpoint()
    for (m <- Seq(1, 2)) {
      mv = IncrementalAgg.refresh(mv, IncrementalAgg.delta(
          e.where(col("event_id") % 3 === m).withColumn("del", lit(false)),
          col("key"), col("cents"), col("del")))
        .localCheckpoint() // carried state, as a real MV would
    }
    val full = IncrementalAgg.bootstrap(e, col("key"), col("cents"))
    assert(mv.exceptAll(full).isEmpty && full.exceptAll(mv).isEmpty)
    // and retracting one third again lands exactly on the complement
    val back = IncrementalAgg.refresh(mv, IncrementalAgg.delta(
      e.where(col("event_id") % 3 === 1).withColumn("del", lit(true)),
      col("key"), col("cents"), col("del")))
    val compl = IncrementalAgg.bootstrap(
      e.where(col("event_id") % 3 =!= 1), col("key"), col("cents"))
    assert(back.exceptAll(compl).isEmpty && compl.exceptAll(back).isEmpty)
  }
}
