package graft.streaming

import graft.testkit.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The `transformWithState` twins must equal their
  * `flatMapGroupsWithState` originals row-for-row: the API generation
  * (typed state variables, first-class timers) must not change results.
  * TWS requires RocksDB, so every drain here also round-trips the typed
  * state and the timer registry through the RocksDB provider — across
  * micro-batches via the staged multi-batch source.
  */
class TwsOperatorsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  private def drainRocks(df: => DataFrame, name: String): DataFrame = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, RocksProvider)
    try {
      val q = EventStreams.runToMemory(df, name, OutputMode.Append)
      q.stop()
      spark.table(name).cache()
    } finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  private def drainDefault(df: => DataFrame, name: String): DataFrame = {
    val q = EventStreams.runToMemory(df, name, OutputMode.Append)
    q.stop()
    spark.table(name).cache()
  }

  private def assertSame(a: DataFrame, b: DataFrame, tag: String): Unit = {
    assert(a.count() > 0, s"$tag: empty result")
    assert(a.count() == b.count() &&
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$tag: transformWithState result differs from flatMapGroupsWithState")
    a.unpersist(); b.unpersist()
  }

  test("TWS running stats equal the fMGWS twin across RocksDB micro-batches") {
    val tws = drainRocks(TwsOperators.runningStatsStreamTws(spark,
      EventStreams.readEventsMultiBatch(spark, dir)), "tws_run")
    val old = drainDefault(EventStreams.runningStatsStream(spark,
      EventStreams.readEvents(spark, dir)), "tws_run_ref")
    assertSame(tws, old, "running")
  }

  test("TWS dedup equals the distinct key set across RocksDB micro-batches") {
    val tws = drainRocks(TwsOperators.dedupStreamTws(spark,
      EventStreams.readEventsMultiBatch(spark, dir)), "tws_dedup")
    val expect = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").distinct().cache()
    assertSame(tws, expect, "dedup")
  }

  test("TWS sessionizer with event-time timers equals the fMGWS twin") {
    val tws = drainRocks(TwsOperators.sessionizeTws(spark,
      EventStreams.readEventsMultiBatch(spark, dir)), "tws_sess")
    val old = drainDefault(EventStreams.sessionize(spark,
      EventStreams.readEvents(spark, dir)), "tws_sess_ref")
    assertSame(tws, old, "sessionize")
  }

  test("warm-started running stats: archive moments seed the stream's priors") {
    import org.apache.spark.sql.expressions.Window
    val warm = drainRocks(TwsOperators.runningStatsWarmStart(spark, dir),
      "tws_warm")
    // reference: full-corpus priors, restricted to the streamed half
    // (rn > 2n/4 under the stager's (ts, event_id) ranking)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val base = ev.select(col("event_type"), col("event_id"),
        graft.io.Tables.eventMicros(ev).as("ts_us"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .withColumn("rn", row_number().over(Window.orderBy("ts_us", "event_id")))
    val n = base.count()
    val fr = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expect = base
      .withColumn("n_prior", count(lit(1)).over(fr))
      .withColumn("sum_prior_cents", coalesce(sum("cents").over(fr), lit(0L)))
      .withColumn("sumsq_prior_cents",
        coalesce(sum(col("cents") * col("cents")).over(fr), lit(0L)))
      .where(col("rn") > lit(2) * n / 4)
      .select("event_type", "event_id", "n_prior", "sum_prior_cents",
        "sumsq_prior_cents")
      .cache()
    assertSame(warm, expect, "warm-start")
  }

  test("MapState profile counts equal the per-(user,type) running occurrence number") {
    import org.apache.spark.sql.expressions.Window
    val tws = drainRocks(TwsOperators.profileStreamTws(spark,
      EventStreams.readEventsMultiBatch(spark, dir)), "tws_profile")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val expect = ev.select(col("user_id"), col("event_id"), col("event_type"),
        graft.io.Tables.eventMicros(ev).as("ts_us"))
      .withColumn("seen_count", row_number().over(
        Window.partitionBy("user_id", "event_type")
          .orderBy("ts_us", "event_id")).cast("long"))
      .select("user_id", "event_id", "event_type", "seen_count")
      .cache()
    assertSame(tws, expect, "profile")
  }

  test("TWS timers fire mid-stream: a session closed by timeout in an early batch") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, RocksProvider)
    try {
      val us = 1000000L
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
      val events = ms.toDF().select(col("_1").as("user_id"),
        col("_2").as("event_id"), (col("_3") * 1000).as("ts"))
      val q = TwsOperators.sessionizeTws(spark, events).writeStream
        .outputMode("append").format("memory").queryName("tws_timer").start()
      try {
        // batch 1: user 1 session at t=1000s..1060s
        ms.addData((1L, 1L, 1000L * us), (1L, 2L, 1060L * us))
        q.processAllAvailable()
        // batch 2: user 2 far in the future -> watermark jumps past
        // user 1's close time; the TIMER (not a successor) must emit it
        ms.addData((2L, 3L, 100000L * us))
        q.processAllAvailable()
        val afterTimer = spark.table("tws_timer")
          .select("user_id", "start_us", "end_us", "n_events")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(afterTimer == Set((1L, 1000L * us, 1060L * us, 2L)),
          s"expected user 1's session closed by timer, got $afterTimer")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  test("stream-stream as-of: a dim version arriving in a LATER batch still wins") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, RocksProvider)
    try {
      val us = 1000000L
      val ms = org.apache.spark.sql.execution.streaming
        .runtime.MemoryStream[(Long, Long, Long, String, Double)]
      val events = ms.toDF().select(col("_1").as("user_id"),
        col("_2").as("event_id"), (col("_3") * 1000).as("ts"),
        col("_4").as("event_type"), col("_5").as("value"))
      val q = TwsOperators.streamAsOfJoinTws(spark, events).writeStream
        .outputMode("append").format("memory").queryName("tws_ssasof").start()
      try {
        // batch 1: dim v1 at t=1000s, fact at t=2000s — the fact MUST
        // NOT emit yet (watermark 0): a dim version timestamped between
        // 1000s and 2000s may still arrive
        ms.addData((1L, 10L, 1000L * us, "click", 1.0),
          (1L, 20L, 2000L * us, "purchase", 0.0))
        q.processAllAvailable()
        assert(spark.table("tws_ssasof").isEmpty,
          "fact emitted before the watermark proved its dim history complete")
        // batch 2: dim v2 at t=1500s (older than the buffered fact,
        // newer than v1) + far-future rows on BOTH branches to push the
        // min-of-maxes watermark past the fact
        ms.addData((1L, 11L, 1500L * us, "click", 2.0),
          (2L, 12L, 100000L * us, "click", 0.0),
          (2L, 21L, 100000L * us, "purchase", 0.0))
        q.processAllAvailable()
        val got = spark.table("tws_ssasof")
          .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
          .collect().toSet
        // fact 20 pairs with dim 11 (1500s, 200 cents), not dim 10;
        // fact 21 (above the final watermark) is still held
        assert(got == Set((1L, 20L, 2000L * us,
          Some(11L), Some(1500L * us), Some(200L))),
          s"as-of matched the wrong dim version: $got")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }
}
