package graft.plans

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** The custom as-of join must match the composable window/interval
  * formulation row-for-row, handle the no-candidate and tolerance
  * edges, and plan as exchanges + sorts + one streaming merge (no
  * cartesian, no pair blow-up node). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand cases: backward pick, no candidate, exact tie, tolerance") {
    val facts = Seq(
      (1L, 100L), (1L, 205L), (1L, 300L), // key 1 at t=100,205,300
      (2L, 50L),                          // key 2 before any version
      (3L, 10L)                           // key absent from dim
    ).toDF("k", "t")
    val dim = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 250L, "c"),
      (2L, 60L, "x")
    ).toDF("dk", "vt", "v")

    val out = AsOfJoin.asOfJoin(facts, dim,
        Seq(col("k")), Seq(col("dk")), col("t"), col("vt"))
      .select("k", "t", "vt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(out == Set(
      (1L, 100L, 100L, "a"),  // exact-time version matches (<=)
      (1L, 205L, 200L, "b"),  // strictly-backward pick, not 250
      (1L, 300L, 250L, "c"),
      (2L, 50L, -1L, null),   // dim starts later -> null
      (3L, 10L, -1L, null)))  // key never in dim -> null

    val tol = AsOfJoin.asOfJoin(facts, dim,
        Seq(col("k")), Seq(col("dk")), col("t"), col("vt"),
        toleranceUs = Some(10L))
      .select("k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(tol == Set(
      (1L, 100L, "a"),   // lag 0 <= 10
      (1L, 205L, "b"),   // lag 5 <= 10
      (1L, 300L, null),  // lag 50 > 10 -> suppressed
      (2L, 50L, null), (3L, 10L, null)))
  }

  test("forward and nearest directions: hand cases") {
    val facts = Seq((1L, 100L), (1L, 205L), (1L, 300L), (1L, 40L))
      .toDF("k", "t")
    val dim = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 250L, "c"))
      .toDF("dk", "vt", "v")
    def run(dir: String, tol: Option[Long] = None) =
      AsOfJoin.asOfJoin(facts, dim, Seq(col("k")), Seq(col("dk")),
          col("t"), col("vt"), tol, dir)
        .select("t", "v").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap

    assert(run("forward") == Map(
      40L -> "a",   // earliest vt >= 40
      100L -> "a",  // exact hit counts for forward too
      205L -> "c",  // next version ahead
      300L -> null))// nothing ahead
    assert(run("nearest") == Map(
      40L -> "a",   // only forward exists
      100L -> "a",  // dist 0
      205L -> "b",  // back dist 5 < fwd dist 45
      300L -> "c")) // only backward exists
    // nearest tie -> backward: t=225 is 25 from both b(200) and c(250)
    val tie = AsOfJoin.asOfJoin(Seq((1L, 225L)).toDF("k", "t"), dim,
        Seq(col("k")), Seq(col("dk")), col("t"), col("vt"),
        direction = "nearest")
      .select("v").head().getString(0)
    assert(tie == "b")
    // forward tolerance
    assert(run("forward", tol = Some(10L)) ==
      Map(40L -> null, 100L -> "a", 205L -> null, 300L -> null))
  }

  test("equals the lead()-interval formulation on the events table") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.01"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val usC = graft.io.Tables.eventMicros(ev)
    val facts = ev.select(col("user_id"), col("event_id"), usC.as("ts_us"))
    val dim = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), usC.as("ts_us"), col("value"))
      .groupBy("d_user", "ts_us").agg(max("value").as("asof_value"))
      .select(col("d_user"), col("ts_us").as("valid_from_us"), col("asof_value"))

    val native = AsOfJoin.asOfJoin(facts, dim,
        Seq(col("user_id")), Seq(col("d_user")),
        col("ts_us"), col("valid_from_us"))
      .select("user_id", "event_id", "ts_us", "asof_value")

    val iv = dim.select(col("d_user"), col("valid_from_us"),
      coalesce(lead(col("valid_from_us"), 1).over(
          Window.partitionBy("d_user").orderBy("valid_from_us")),
        lit(Long.MaxValue)).as("valid_to_us"),
      col("asof_value"))
    val composed = facts.join(iv,
        col("user_id") === col("d_user") &&
          col("ts_us") >= col("valid_from_us") && col("ts_us") < col("valid_to_us"),
        "left")
      .select("user_id", "event_id", "ts_us", "asof_value")

    assert(native.count() == facts.count(), "as-of join must preserve left rows")
    assert(native.count() == composed.count() &&
      native.except(composed).isEmpty && composed.except(native).isEmpty,
      "native as-of join disagrees with the interval formulation")
    assert(native.where(col("asof_value").isNotNull).count() > 0)
    assert(native.where(col("asof_value").isNull).count() > 0)
  }

  test("plans as exchanges + sorts + one merge: no cartesian, no pair blow-up") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val usC = graft.io.Tables.eventMicros(ev)
    val facts = ev.select(col("user_id"), col("event_id"), usC.as("ts_us"))
    val dim = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), usC.as("vf"), col("value"))
    val df = AsOfJoin.asOfJoin(facts, dim,
      Seq(col("user_id")), Seq(col("d_user")), col("ts_us"), col("vf"))
    df.collect() // materialize (finalizes any adaptive plan)
    val nodes = PlanWalk.nodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
    assert(!nodes.exists(p => p.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]))
    val sorts = nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
    assert(sorts >= 2, s"expected both children sorted, saw $sorts SortExec nodes")
  }
}
