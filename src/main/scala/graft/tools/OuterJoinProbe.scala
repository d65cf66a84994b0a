package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe for the stream-stream LEFT OUTER join's null-emission
  * boundary: which unmatched left rows does the final watermark evict
  * (and therefore null-emit) in an AvailableNow drain? Prints the
  * unmatched-row counts bucketed against candidate eviction predicates
  * so the st_range_join_outer oracle encodes the exact one Spark uses.
  */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = graft.queries.StreamingGateQueries.queries("st_range_join_outer")(spark, dir)
    val nulls = out.where(col("click_id").isNull)
      .select("interval_id", "p_ts_us")

    val ev = spark.read.parquet(s"$dir/events.parquet")
    val usC = graft.io.Tables.eventMicros(ev)
    val maxUs = ev.agg(max(usC)).head().getLong(0)
    // NOTE the naive wm (max over ALL events - 2h) is deliberately kept
    // here: this probe's output is what REVEALED it to be wrong — the
    // true global watermark is the MIN over the two filtered sides'
    // ms-floored delayed watermarks (see the gate oracle), which this
    // probe prints below for comparison.
    val wmMs = maxUs / 1000 - 2L * 3600L * 1000L
    val windowUs = 1800L * 1000000L
    val sideWmMs = Seq("click", "purchase").map { t =>
      ev.where(col("event_type") === t).agg(max(usC)).head().getLong(0) / 1000 -
        2L * 3600L * 1000L
    }.min
    println(s"PROBE min_side_wm_ms=$sideWmMs eviction_p_ts_below=${sideWmMs * 1000 - windowUs}")

    println(s"PROBE maxUs=$maxUs wmMs=$wmMs nullRows=${nulls.count()}")
    val stats = nulls.agg(
      max((col("p_ts_us") + windowUs)).as("max_winend_us"),
      max(col("p_ts_us")).as("max_p_ts_us")).head()
    println(s"PROBE max_winend_us=${stats.getLong(0)} (wm_us=${wmMs * 1000})")
    println(s"PROBE winend_ms_lt_wm=${nulls.where(((col("p_ts_us") + windowUs) / 1000).cast("long") < wmMs).count()}")
    println(s"PROBE winend_ms_le_wm=${nulls.where(((col("p_ts_us") + windowUs) / 1000).cast("long") <= wmMs).count()}")
    println(s"PROBE pts_ms_lt_wm_minus_window=${nulls.where((col("p_ts_us") / 1000).cast("long") < wmMs - windowUs / 1000).count()}")

    // all unmatched purchases in batch terms, for comparison
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), usC.as("pts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), usC.as("cts"))
    val unmatched = p.join(c,
        col("pu") === col("cu") && col("cts") >= col("pts") &&
          col("cts") <= col("pts") + windowUs, "left_anti")
    println(s"PROBE batch_unmatched=${unmatched.count()}")
    println(s"PROBE batch_unmatched_winend_ms_lt_wm=${unmatched.where((((col("pts") + windowUs) / 1000).cast("long")) < wmMs).count()}")
    println(s"PROBE batch_unmatched_winend_ms_le_wm=${unmatched.where((((col("pts") + windowUs) / 1000).cast("long")) <= wmMs).count()}")
    // the rows batch-side predicates admit but the stream did not emit
    val streamedIds = nulls.select(col("interval_id").as("pid2"))
    val missed = unmatched
      .where((((col("pts") + windowUs) / 1000).cast("long")) < wmMs)
      .join(streamedIds, col("pid") === col("pid2"), "left_anti")
      .select("pid", "pts").collect()
    missed.foreach { r =>
      val pts = r.getLong(1)
      println(s"PROBE missed pid=${r.getLong(0)} pts_us=$pts pts_ms=${pts / 1000} " +
        s"winend_ms=${pts / 1000 + 1800000} wm_minus_winend_ms=${wmMs - (pts / 1000 + 1800000)}")
      println("PROBE missed stream rows:")
      out.where(col("interval_id") === r.getLong(0)).collect()
        .foreach(x => println(s"PROBE   $x"))
      println("PROBE missed event rows:")
      ev.where(col("event_id") === r.getLong(0)).collect()
        .foreach(x => println(s"PROBE   $x"))
      println("PROBE same-user events inside the window:")
      ev.where(col("user_id") === 12 && usC.between(pts, pts + windowUs))
        .collect().foreach(x => println(s"PROBE   $x"))
      println("PROBE same-user clicks within +-4h:")
      ev.where(col("user_id") === 12 && col("event_type") === "click" &&
          usC.between(pts - 8 * windowUs, pts + 8 * windowUs))
        .collect().foreach(x => println(s"PROBE   $x"))
    }
    spark.stop()
  }
}
