package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Driver-gate entries that execute the Structured Streaming surface in a
  * bounded run: the events parquet is read through `readStream`
  * (FileStreamSource), drained with `Trigger.AvailableNow` into a memory
  * sink, and the sink table is returned as the gate result — so the
  * streaming operators themselves (stateful funnel, watermark dedup,
  * windowed sketch aggregation with append-mode eviction) round-trip
  * through the same DuckDB-oracle hash gate as every batch operator.
  *
  * Determinism: the testdata `events.parquet` is a single file, so the
  * drain is one data micro-batch (within a batch `flatMapGroupsWithState`
  * groups process their rows after an explicit event-time sort — see
  * [[EventStreams.funnelStream]]), followed by the no-data batch that
  * advances the watermark to `max(tts) - delay` and flushes append-mode
  * windows whose END is at or below it. The oracles replay exactly that:
  * batch semantics for the funnel, `DISTINCT` keys for dedup, and the
  * closed-window subset for the windowed sketch.
  */
object StreamingGateQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Start `df` on a memory sink, drain AvailableNow, return the table. */
  private def drain(spark: SparkSession, df: DataFrame, name: String): DataFrame = {
    val q = EventStreams.runToMemory(df, name, OutputMode.Append)
    q.stop()
    spark.table(name)
  }

  val queries: Map[String, Q] = Map(
    // Stateful streaming funnel (flatMapGroupsWithState, NoTimeout): in a
    // single-batch drain it reproduces the batch conditional-min stage
    // times exactly (EventStreamsSpec proves the equality).
    "st_funnel" -> ((s, dir) =>
      drain(s, EventStreams.funnelStream(s, EventStreams.readEvents(s, dir)),
        "st_funnel_gate")),

    // Streaming exact dedup (dropDuplicatesWithinWatermark): the KEY SET
    // kept is deterministic (first arrival per key); which physical row
    // carried it is not, so the gate projects to the keys.
    "st_dedup" -> ((s, dir) =>
      drain(s, EventStreams.dedupStream(EventStreams.readEvents(s, dir),
          Seq("user_id", "event_type")), "st_dedup_gate")
        .select("user_id", "event_type")),

    // Windowed log-bin quantile sketch under append-mode eviction: only
    // windows closed by the final watermark (max event time - 2 h) emit.
    "st_window_lgq" -> ((s, dir) =>
      drain(s, EventStreams.logQuantileStream(EventStreams.readEvents(s, dir)),
        "st_lgq_gate"))
  )

  private val HourUs = 3600L * 1000000L

  val oracles: Map[String, String] = Map(
    "st_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  epoch_ns(ts) // 1000 AS ts_us FROM events),
        |t1 AS (SELECT user_id, min(ts_us) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(ts_us) AS t FROM e JOIN t1 USING (user_id)
        |  WHERE event_type = 'click' AND ts_us > t1.t GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(ts_us) AS t FROM e JOIN t2 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us > t2.t GROUP BY 1)
        |SELECT user_id, CAST(0 AS BIGINT) AS stage_idx, 'view' AS stage, t AS ts_us FROM t1
        |UNION ALL
        |SELECT user_id, CAST(1 AS BIGINT), 'click', t FROM t2
        |UNION ALL
        |SELECT user_id, CAST(2 AS BIGINT), 'purchase', t FROM t3""".stripMargin,

    "st_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    "st_window_lgq" -> graft.functions.LogQuantiles.oracleSqlGrouped(
      table = s"""(SELECT (epoch_ns(ts) // 1000)
                 |    - (epoch_ns(ts) // 1000) % $HourUs AS ws,
                 |    event_type,
                 |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                 |  FROM events
                 |  WHERE (epoch_ns(ts) // 1000) - (epoch_ns(ts) // 1000) % $HourUs
                 |      + $HourUs
                 |    <= (SELECT max(epoch_ns(ts) // 1000) FROM events)
                 |      - ${2 * HourUs}) ev""".stripMargin,
      valueExpr = "cents",
      groupCols = Seq("ws" -> "win_start_us", "event_type" -> "event_type"),
      qs = Seq("p50_cents" -> 0.5, "p95_cents" -> 0.95, "p99_cents" -> 0.99))
  )
}
