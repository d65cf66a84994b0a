package graft.streaming

import graft.testkit.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.OutputMode

/** The multi-batch gate entries must genuinely run MULTIPLE data
  * micro-batches (one per staged file) and still end at the single-batch
  * drain's table — that's the whole point: the driver gate then verifies
  * cross-batch state carry (funnel stage times spanning batches, dedup
  * hits against prior-batch state, running-stat accumulation, mid-stream
  * window eviction) against DuckDB, not just within-batch logic. */
class MultiBatchGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def drainCounting(df: DataFrame, name: String): (DataFrame, Int) = {
    val q = EventStreams.runToMemory(df, name, OutputMode.Append)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    (spark.table(name), dataBatches)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.count() > 0, s"$what: empty result")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: multi-batch result differs from single-batch")
  }

  test("funnel over 4 files runs >=4 data batches and equals the single-batch drain") {
    val (mb, nb) = drainCounting(
      EventStreams.funnelStream(spark, EventStreams.readEventsMultiBatch(spark, dir)),
      "mbspec_funnel")
    assert(nb >= 4, s"expected >=4 data micro-batches, saw $nb")
    val q = EventStreams.runToMemory(
      EventStreams.funnelStream(spark, EventStreams.readEvents(spark, dir)),
      "mbspec_funnel_1b", OutputMode.Append)
    q.stop()
    assertSameRows(mb, spark.table("mbspec_funnel_1b"), "funnel")
  }

  test("dedup with corpus-covering horizon carries state across batches") {
    val (mb, nb) = drainCounting(
      EventStreams.dedupStream(EventStreams.readEventsMultiBatch(spark, dir),
        Seq("user_id", "event_type"), horizon = "744 hours"),
      "mbspec_dedup")
    assert(nb >= 4, s"expected >=4 data micro-batches, saw $nb")
    // key set == DISTINCT: every later-batch duplicate was dropped
    // against state created in an earlier batch
    val keys = mb.select("user_id", "event_type")
    val distinct = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").distinct()
    assert(keys.count() === distinct.count(),
      "cross-batch duplicate slipped through (or a key re-emitted)")
    assertSameRows(keys, distinct, "dedup keys")
  }

  test("running stats accumulate across batches (prior-state from earlier files)") {
    val (mb, nb) = drainCounting(
      EventStreams.runningStatsStream(spark,
        EventStreams.readEventsMultiBatch(spark, dir)),
      "mbspec_running")
    assert(nb >= 4, s"expected >=4 data micro-batches, saw $nb")
    val q = EventStreams.runToMemory(
      EventStreams.runningStatsStream(spark, EventStreams.readEvents(spark, dir)),
      "mbspec_running_1b", OutputMode.Append)
    q.stop()
    assertSameRows(mb, spark.table("mbspec_running_1b"), "running stats")
  }

  test("windowed log-quantiles evict mid-stream and match the single-batch drain") {
    val (mb, nb) = drainCounting(
      EventStreams.logQuantileStream(EventStreams.readEventsMultiBatch(spark, dir)),
      "mbspec_lgq")
    assert(nb >= 4, s"expected >=4 data micro-batches, saw $nb")
    // mid-stream eviction proof: some window must emit BEFORE the last
    // data batch (the 30-day corpus splits into ~180 h files; the 2 h
    // watermark closes batch-1 windows during batch 2)
    val q0 = EventStreams.runToMemory(
      EventStreams.logQuantileStream(EventStreams.readEvents(spark, dir)),
      "mbspec_lgq_1b", OutputMode.Append)
    q0.stop()
    assertSameRows(mb, spark.table("mbspec_lgq_1b"), "log-quantiles")
  }

  test("multi-batch drain emits rows before the final batch (genuine mid-stream eviction)") {
    val qq = EventStreams.runToMemory(
      EventStreams.logQuantileStream(
        EventStreams.readEventsMultiBatch(spark, dir, nFiles = 4)),
      "mbspec_lgq_progress", OutputMode.Append)
    val sinkRowsPerBatch = qq.recentProgress.toSeq
      .filter(_.numInputRows > 0)
      .map(p => Option(p.sink.numOutputRows).map(_.longValue).getOrElse(-1L))
    qq.stop()
    // at least one NON-final data batch wrote to the sink
    assert(sinkRowsPerBatch.dropRight(1).exists(_ > 0),
      s"no mid-stream emission; per-batch sink rows = $sinkRowsPerBatch")
  }
}
