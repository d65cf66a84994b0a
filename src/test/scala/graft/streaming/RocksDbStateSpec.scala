package graft.streaming

import graft.testkit.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** The engine's stateful streaming operators must run unchanged on the
  * RocksDB state store provider — the off-heap, spill-to-disk backend a
  * 1000-executor deployment actually uses (HDFSBackedStateStore keeps
  * every key in executor heap; RocksDB bounds memory and scales state to
  * disk). Each path runs on both providers and must produce IDENTICAL
  * results: the windowed-aggregation state format, the
  * flatMapGroupsWithState custom-state codec, and the
  * dropDuplicatesWithinWatermark key store.
  */
class RocksDbStateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  private def drainWith(provider: Option[String], op: DataFrame => DataFrame,
      name: String): DataFrame = {
    val prev = spark.conf.getOption(ConfKey)
    provider.foreach(spark.conf.set(ConfKey, _))
    try {
      val q = EventStreams.runToMemory(
        op(EventStreams.readEvents(spark, dir)), name, OutputMode.Append)
      q.stop()
      // memory table contents survive the query; copy out eagerly anyway
      spark.table(name).cache()
    } finally {
      provider.foreach(_ => prev match {
        case Some(v) => spark.conf.set(ConfKey, v)
        case None => spark.conf.unset(ConfKey)
      })
    }
  }

  private def assertSame(op: DataFrame => DataFrame, tag: String): Unit = {
    val d = drainWith(None, op, s"rocks_def_$tag")
    val r = drainWith(Some(RocksProvider), op, s"rocks_rdb_$tag")
    assert(d.count() > 0, s"$tag: default provider emitted nothing")
    assert(d.count() == r.count() && d.except(r).isEmpty && r.except(d).isEmpty,
      s"$tag: RocksDB provider result differs from default provider")
    d.unpersist(); r.unpersist()
  }

  test("windowed aggregation state runs on RocksDB identically") {
    assertSame(EventStreams.windowedAgg, "winagg")
  }

  test("flatMapGroupsWithState custom state runs on RocksDB identically") {
    assertSame(EventStreams.runningStatsStream(spark, _), "running")
  }

  test("watermarked dedup key store runs on RocksDB identically") {
    assertSame(EventStreams.dedupStream(_, Seq("user_id", "event_type")), "dedup")
  }
}
