package graft.pipeline

import graft.testkit.SparkSpec
import org.apache.spark.sql.functions._

/** The expectations operators must actually CATCH dirty data — the
  * driver gates run them on clean tables, so the failure paths (orphan
  * FKs, nulls, out-of-domain values) are pinned here. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls, distincts, and min/max per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a"))
    ).toDF("id", "tag")
    val p = DataQuality.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(p("id") == ((4L, 1L, 2L, "1", "2")))
    assert(p("tag") == ((4L, 1L, 2L, "a", "c")))
  }

  test("refIntegrity flags orphans; null FKs are not orphans") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.refIntegrity(child, col("fk"), parent, col("pk")).head()
    assert(r.getLong(0) == 4L)     // n_rows
    assert(r.getLong(1) == 1L)     // n_null_fk
    assert(r.getLong(2) == 1L)     // n_orphans: only 99
    assert(!r.getBoolean(3))       // fk_ok = false
    val clean = DataQuality.refIntegrity(
      Seq(1L, 2L).toDF("fk"), col("fk"), parent, col("pk")).head()
    assert(clean.getLong(2) == 0L && clean.getBoolean(3))
  }

  test("acceptedValues separates in-domain from drift values") {
    val df = Seq("view", "view", "click", "mystery").toDF("t")
    val out = DataQuality.acceptedValues(df, col("t"), Seq("view", "click"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out("view") == ((2L, true)))
    assert(out("click") == ((1L, true)))
    assert(out("mystery") == ((1L, false)))
  }

  test("categoricalDrift: stable categories contribute ~0, new ones alert") {
    // base: 50/50 a/b. current: same shape PLUS a brand-new category.
    val base = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("t")
    val cur = (Seq.fill(48)("a") ++ Seq.fill(48)("b") ++ Seq.fill(20)("new"))
      .toDF("t")
    val out = DataQuality.categoricalDrift(base, cur, col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    assert(out.keySet == Set("a", "b", "new"))
    assert(out("new")._1 == 0L)          // unseen in base
    // the new category's contribution dwarfs the stable ones
    assert(out("new")._3 > 10 * math.max(out("a")._3, out("b")._3))
    // identical distributions → every contribution tiny
    val same = DataQuality.categoricalDrift(base, base, col("t"))
      .collect().map(_.getDouble(4))
    assert(same.forall(_ < 0.1))
  }

  test("ksTest: hand-computed exact statistic, identical samples, disjoint samples") {
    // base [1,2,3,4], cur [3,5]: CDF diffs .25/.5/.25/.5/0 -> D = 0.5,
    // d_num = max|cb*2 - cc*4| = 4 over n1*n2 = 8
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("g", _, false)) ++
      Seq(3.0, 5.0).map(("g", _, true))).toDF("grp", "v", "cur")
    val r = DataQuality.ksTest(df, col("grp"), col("v"), col("cur")).head()
    assert(r.getAs[Long]("n_base") == 4L && r.getAs[Long]("n_cur") == 2L)
    assert(r.getAs[Long]("d_num") == 4L)
    assert(r.getAs[Double]("d") == 0.5)
    // identical samples -> D = 0 exactly
    val same = (Seq(1.0, 2.0, 7.0).map(("g", _, false)) ++
      Seq(1.0, 2.0, 7.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.ksTest(same, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("d") == 0.0)
    // fully separated samples -> D = 1 exactly
    val apart = (Seq(1.0, 2.0).map(("g", _, false)) ++
      Seq(9.0, 10.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.ksTest(apart, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("d") == 1.0)
  }

  test("mwuTest: hand-computed midrank statistic, tie handling, symmetry") {
    // base [1,2,3], cur [2,4]: sorted 1,2,2,3,4 with midranks
    // 1, 2.5, 2.5, 4, 5 -> R_cur = 7.5, U_cur = 7.5 - 3 = 4.5,
    // u2_cur = 9; AUC = 4.5/6 = 0.75 (pairs: 4 wins + 1 tie of 6)
    val df = (Seq(1.0, 2.0, 3.0).map(("g", _, false)) ++
      Seq(2.0, 4.0).map(("g", _, true))).toDF("grp", "v", "cur")
    val r = DataQuality.mwuTest(df, col("grp"), col("v"), col("cur")).head()
    assert(r.getAs[Long]("n_base") == 3L && r.getAs[Long]("n_cur") == 2L)
    assert(r.getAs[Long]("u2_cur") == 9L)
    assert(r.getAs[Double]("auc") == 0.75)
    // identical samples -> no shift, AUC exactly 0.5
    val same = (Seq(1.0, 5.0, 9.0).map(("g", _, false)) ++
      Seq(1.0, 5.0, 9.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.mwuTest(same, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("auc") == 0.5)
    // current strictly above base -> AUC exactly 1; below -> 0
    val above = (Seq(1.0, 2.0).map(("g", _, false)) ++
      Seq(3.0, 4.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.mwuTest(above, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("auc") == 1.0)
    val below = (Seq(3.0, 4.0).map(("g", _, false)) ++
      Seq(1.0, 2.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.mwuTest(below, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("auc") == 0.0)
  }

  test("tvdTest: hand-computed exact statistic, identical samples, disjoint samples") {
    // base [1,2,3,4], cur [3,5]: per-point |b*2 - c*4| = 2,2,2,2,4 ->
    // tvd_num = 12 over 2*n_b*n_c = 16 -> TVD = 0.75
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("g", _, false)) ++
      Seq(3.0, 5.0).map(("g", _, true))).toDF("grp", "v", "cur")
    val r = DataQuality.tvdTest(df, col("grp"), col("v"), col("cur")).head()
    assert(r.getAs[Long]("n_base") == 4L && r.getAs[Long]("n_cur") == 2L)
    assert(r.getAs[Long]("tvd_num") == 12L)
    assert(r.getAs[Double]("tvd") == 0.75)
    // identical samples -> TVD = 0 exactly
    val same = (Seq(1.0, 2.0, 7.0).map(("g", _, false)) ++
      Seq(1.0, 2.0, 7.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.tvdTest(same, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("tvd") == 0.0)
    // disjoint supports -> TVD = 1 exactly (all mass moved)
    val apart = (Seq(1.0, 2.0).map(("g", _, false)) ++
      Seq(9.0, 10.0).map(("g", _, true))).toDF("grp", "v", "cur")
    assert(DataQuality.tvdTest(apart, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("tvd") == 1.0)
    // TVD dominates KS on shared supports: mass can move without the
    // CDF max moving as much (KS ≤ TVD always)
    val ks = DataQuality.ksTest(df, col("grp"), col("v"), col("cur"))
      .head().getAs[Double]("d")
    assert(ks <= r.getAs[Double]("tvd"))
  }

  test("streaming TVD fold over micro-batches equals the one-shot batch statistic") {
    val dir = "/root/testdata/sf0.001"
    val batch = DataQuality.tvdTest(
      spark.read.parquet(s"$dir/events.parquet"),
      col("event_type"), col("value"), col("event_id") % 2 =!= 0)
    val streamed = graft.streaming.EventStreams.tvdMonitorSink(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("quantileShift: hand-computed type-1 deciles, uniform shift, ties") {
    // base 10..100 step 10 (n=10): decile q = 10q; cur = base + 5
    val df = ((1 to 10).map(i => ("g", i * 10L, false)) ++
      (1 to 10).map(i => ("g", i * 10L + 5L, true))).toDF("grp", "v", "cur")
    val r = DataQuality.quantileShift(df, col("grp"), col("v"), col("cur"))
      .collect().map(x => x.getAs[Long]("q") ->
        ((x.getAs[Long]("base_cents"), x.getAs[Long]("cur_cents"),
          x.getAs[Long]("shift_cents")))).toMap
    assert(r.keySet == (1L to 9L).toSet)
    (1L to 9L).foreach { q =>
      assert(r(q) == ((q * 10L, q * 10L + 5L, 5L)), s"decile $q: ${r(q)}")
    }
    // ties and tiny n: base [1,1,2] -> q=7 needs cum >= ceil(2.1) = 3 -> 2
    val t = (Seq(1L, 1L, 2L).map(("g", _, false)) ++ Seq(1L).map(("g", _, true)))
      .toDF("grp", "v", "cur")
    val m = DataQuality.quantileShift(t, col("grp"), col("v"), col("cur"))
      .collect().map(x => x.getAs[Long]("q") -> x.getAs[Long]("base_cents")).toMap
    assert(m(1L) == 1L && m(6L) == 1L && m(7L) == 2L && m(9L) == 2L)
  }

  test("streaming Q-Q fold over micro-batches equals the one-shot batch table") {
    val dir = "/root/testdata/sf0.001"
    val batch = DataQuality.quantileShift(
      spark.read.parquet(s"$dir/events.parquet"), col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long"), col("event_id") % 2 =!= 0)
    val streamed = graft.streaming.EventStreams.qqMonitorSink(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("kaplanMeierBy: cohorts are independent — each equals its solo curve") {
    // two cohorts with different censoring structure, computed in one
    // pass, must match the single-curve operator run per cohort
    val a = Seq((1L, 1L), (2L, 0L), (3L, 1L))
    val b = Seq((1L, 0L), (2L, 1L), (2L, 1L), (5L, 0L))
    val both = (a.map { case (d, e) => ("A", d, e) } ++
      b.map { case (d, e) => ("B", d, e) }).toDF("cohort", "dur", "evt")
    val joint = DataQuality.kaplanMeierBy(both, col("cohort"), col("dur"),
      col("evt"))
    for ((name, rows) <- Seq("A" -> a, "B" -> b)) {
      val solo = DataQuality.kaplanMeier(rows.toDF("dur", "evt"),
        col("dur"), col("evt"))
      val part = joint.where(col("cohort") === name).drop("cohort")
      assert(part.exceptAll(solo).isEmpty && solo.exceptAll(part).isEmpty,
        s"cohort $name diverged from its solo curve")
    }
  }

  test("cusumReport: level shift peaks at the end of the shifted run; flat is 0") {
    // x = [0,0,0,10,10]: n=5, sx=20, dev = [-20,-20,-20,30,30],
    // cum = [-20,-40,-60,-30,0], runmin(incl 0) = [-20,...,-60],
    // s = [0,0,0,30,60] -> peak 60 at t=5
    val df = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 10L), (5L, 10L))
      .map { case (t, x) => ("g", t, t, x) }.toDF("grp", "t", "eid", "x")
    val r = DataQuality.cusumReport(df, col("grp"), col("t"), col("eid"),
      col("x")).head()
    assert(r.getAs[Long]("max_cusum") == 60L)
    assert(r.getAs[Long]("cp_event_id") == 5L)
    // constant series: every deviation 0, peak 0 at the first row
    val flat = (1L to 4L).map(t => ("g", t, t, 7L)).toDF("grp", "t", "eid", "x")
    val f = DataQuality.cusumReport(flat, col("grp"), col("t"), col("eid"),
      col("x")).head()
    assert(f.getAs[Long]("max_cusum") == 0L && f.getAs[Long]("cp_event_id") == 1L)
    // high-then-drop series: the upward excursion peaks on the last
    // above-mean row, and the drop returns s to 0 (never negative)
    val down = Seq((1L, 10L), (2L, 10L), (3L, 0L))
      .map { case (t, x) => ("g", t, t, x) }.toDF("grp", "t", "eid", "x")
    val d = DataQuality.cusumReport(down, col("grp"), col("t"), col("eid"),
      col("x")).head()
    // dev = [10,10,-20], cum=[10,20,0], runmin incl 0 = 0 -> s=[10,20,0]
    assert(d.getAs[Long]("max_cusum") == 20L && d.getAs[Long]("cp_event_id") == 2L)
  }

  test("streaming CUSUM prefix fold equals the one-shot target report at two cadences") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/events.parquet")
    val batch = DataQuality.cusumTargetReport(
      e.withColumn("ts_us", graft.io.Tables.eventMicros(e)),
      col("event_type"), col("ts_us"), col("event_id"),
      floor(col("value") * 100 + 0.5).cast("long"), target = 5000L)
    val s4 = graft.streaming.EventStreams.cusumMonitorSink(spark, dir)
    assert(s4.exceptAll(batch).isEmpty && batch.exceptAll(s4).isEmpty,
      "4-batch fold diverged from the one-shot report")
    // the prefix summary is associative, so a finer cadence (more
    // concatenation points) must not move the answer
    val s8 = graft.streaming.EventStreams.cusumMonitorSink(spark, dir, nFiles = 8)
    assert(s8.exceptAll(batch).isEmpty && batch.exceptAll(s8).isEmpty,
      "8-batch fold diverged")
  }

  test("kaplanMeier: hand-computed curve with censoring") {
    // subjects (dur, evt): (1,1) (2,0) (3,1) (3,1) (4,0)
    // t=1: n=5, d=1 -> S = 4/5 = 0.8
    // t=3: before = 2 (durs 1,2), n=3, d=2 -> S = 0.8 * 1/3
    // censored t=2 and t=4 contribute no rows but shrink risk sets
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 1L), (4L, 0L))
      .toDF("dur", "evt")
    val r = DataQuality.kaplanMeier(df, col("dur"), col("evt"))
      .collect().map(x => x.getAs[Long]("t") ->
        ((x.getAs[Long]("n_risk"), x.getAs[Long]("n_events"),
          x.getAs[Double]("surv")))).toMap
    assert(r.keySet == Set(1L, 3L))
    assert(r(1L) == ((5L, 1L, 0.8)))
    assert(r(3L)._1 == 3L && r(3L)._2 == 2L)
    assert(math.abs(r(3L)._3 - 0.8 / 3.0) < 1e-9)
    // no censoring -> S at the last event = exact empirical survivor
    val all = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L)).toDF("dur", "evt")
    val s4 = DataQuality.kaplanMeier(all, col("dur"), col("evt"))
      .where(col("t") === 4L).head().getAs[Double]("surv")
    assert(s4 == 0.0)
  }

  test("skewReport: uniform keys score 0, a dominant key is named") {
    // uniform: 4 keys x 3 rows each -> gini 0, hhi = 1/n_keys, top 1/4
    val uni = (for { k <- 1 to 4; _ <- 1 to 3 } yield ("g", k.toLong))
      .toDF("grp", "k")
    val u = DataQuality.skewReport(uni, col("grp"), col("k")).head()
    assert(u.getAs[Long]("n_keys") == 4L && u.getAs[Long]("n_rows") == 12L)
    assert(u.getAs[Long]("gini_num") == 0L)
    assert(u.getAs[Double]("gini") == 0.0)
    assert(u.getAs[Double]("hhi") == 0.25)
    assert(u.getAs[Double]("top_share") == 0.25)
    // hot key: key 9 owns 9 of 12 rows, three singleton keys.
    // sorted x = [1,1,1,9], gini_num = -3·1 -1·1 +1·1 +3·9 = 24,
    // gini = 24/(4·12) = 0.5, hhi = (1+1+1+81)/144
    val hot = ((1 to 3).map(k => ("g", k.toLong)) ++
      Seq.fill(9)(("g", 9L))).toDF("grp", "k")
    val h = DataQuality.skewReport(hot, col("grp"), col("k")).head()
    assert(h.getAs[Long]("gini_num") == 24L)
    assert(h.getAs[Double]("gini") == 0.5)
    assert(h.getAs[Long]("hhi_num") == 84L)
    assert(h.getAs[Double]("top_share") == 0.75)
  }

  test("spearmanTrend: hand-computed tie case; monotone extremes; constant column -> NULL") {
    // x=[1,1,2], y=[1,2,3]: ax (2x midranks) = [3,3,6], ay = [2,4,6]
    // -> Sxy = 3*54 - 144 = 18, Sxx = 18, Syy = 24; rho replays the
    // identical IEEE closing expression bit-for-bit
    val df = Seq(("g", 1.0, 1L), ("g", 1.0, 2L), ("g", 2.0, 3L))
      .toDF("grp", "x", "y")
    val r = DataQuality.spearmanTrend(df, col("grp"), col("x"), col("y")).head()
    assert(r.getAs[Long]("sxy") == 18L && r.getAs[Long]("sxx") == 18L &&
      r.getAs[Long]("syy") == 24L)
    assert(r.getAs[Double]("rho") ==
      18.0 / (math.sqrt(18.0) * math.sqrt(24.0)))
    // strictly monotone up / down: |rho| = 1 up to the sqrt closing ulp
    val up = Seq(("g", 1.0, 5L), ("g", 2.0, 7L), ("g", 3.0, 9L), ("g", 4.0, 11L))
      .toDF("grp", "x", "y")
    assert(math.abs(DataQuality.spearmanTrend(up, col("grp"), col("x"), col("y"))
      .head().getAs[Double]("rho") - 1.0) < 1e-12)
    val down = Seq(("g", 4.0, 5L), ("g", 3.0, 7L), ("g", 2.0, 9L), ("g", 1.0, 11L))
      .toDF("grp", "x", "y")
    assert(math.abs(DataQuality.spearmanTrend(down, col("grp"), col("x"), col("y"))
      .head().getAs[Double]("rho") + 1.0) < 1e-12)
    // constant x: Sxx = 0 -> NULL, never NaN
    val const = Seq(("g", 7.0, 1L), ("g", 7.0, 2L), ("g", 7.0, 3L))
      .toDF("grp", "x", "y")
    assert(DataQuality.spearmanTrend(const, col("grp"), col("x"), col("y"))
      .head().isNullAt(5))
  }

  test("pair-count Spearman equals the per-row rank-window formulation BIT-FOR-BIT") {
    // the per-row formulation (what the DuckDB oracle replays),
    // written independently here: a = 2*RANK() + |ties| - 1 per row
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val base = ev.select(col("event_type").as("grp"), col("value").as("x"),
      graft.io.Tables.eventMicros(ev).as("y"))
    val ranked = base
      .withColumn("ax",
        lit(2L) * rank().over(Window.partitionBy("grp").orderBy("x")) +
          count(lit(1)).over(Window.partitionBy("grp", "x")) - 1L)
      .withColumn("ay",
        lit(2L) * rank().over(Window.partitionBy("grp").orderBy("y")) +
          count(lit(1)).over(Window.partitionBy("grp", "y")) - 1L)
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("ax").as("sax"), sum("ay").as("say"),
        sum(col("ax") * col("ax")).as("sxx_s"),
        sum(col("ay") * col("ay")).as("syy_s"),
        sum(col("ax") * col("ay")).as("sxy_s"))
      .select(col("grp"), col("n"),
        (col("n") * col("sxy_s") - col("sax") * col("say")).as("sxy"),
        (col("n") * col("sxx_s") - col("sax") * col("sax")).as("sxx"),
        (col("n") * col("syy_s") - col("say") * col("say")).as("syy"))
      .withColumn("rho", col("sxy").cast("double") /
        (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))))
    val fromCounts = DataQuality.spearmanTrend(ev, col("event_type"),
      col("value"), graft.io.Tables.eventMicros(ev))
    // exceptAll compares doubles exactly — identical integer
    // accumulators through the shared closing expression must
    // reproduce the identical bit pattern
    assert(fromCounts.exceptAll(ranked).isEmpty &&
      ranked.exceptAll(fromCounts).isEmpty)
  }

  test("streaming Spearman fold over micro-batches equals the one-shot batch statistic") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val batch = DataQuality.spearmanTrend(ev, col("event_type"),
      col("value"), graft.io.Tables.eventMicros(ev))
    val streamed = graft.streaming.EventStreams.spearmanMonitorSink(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming skew fold over micro-batches equals the one-shot batch report") {
    val dir = "/root/testdata/sf0.001"
    val batch = DataQuality.skewReport(
      spark.read.parquet(s"$dir/events.parquet"),
      col("event_type"), col("user_id"))
    val streamed = graft.streaming.EventStreams.skewMonitorSink(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming KS fold over micro-batches equals the one-shot batch statistic") {
    val dir = "/root/testdata/sf0.001"
    val batch = DataQuality.ksTest(
      spark.read.parquet(s"$dir/events.parquet"),
      col("event_type"), col("value"), col("event_id") % 2 =!= 0)
    val streamed = graft.streaming.EventStreams.ksMonitorSink(spark, dir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("benford: digit extraction from exact cents, planted distribution, exclusions") {
    // cents 19,25,199,2,-3,0: digits 1,2,1,2 (negative and zero excluded)
    val df = Seq(19L, 25L, 199L, 2L, -3L, 0L).map(("g", _)).toDF("grp", "c")
    val r = DataQuality.benford(df, col("grp"), col("c"))
      .collect().map(x => x.getAs[Int]("digit") ->
        ((x.getAs[Long]("n_obs"), x.getAs[Long]("n_rows"),
          x.getAs[Double]("expected")))).toMap
    assert(r.keySet == Set(1, 2))
    assert(r(1)._1 == 2L && r(2)._1 == 2L)
    assert(r(1)._2 == 4L)
    // expected = n_rows * the shared literal, one multiply
    assert(r(1)._3 == 4.0 * 0.3010299956639812)
    assert(r(2)._3 == 4.0 * 0.17609125905568124)
    // a perfectly-Benford synthetic sample scores tiny contributions:
    // counts proportional to p over 10000 rows
    val n = 10000
    val rows = DataQuality.BenfordP.flatMap { case (d, p) =>
      Seq.fill(math.round(p * n).toInt)(("g", d.toLong))
    }
    val chi = DataQuality.benford(rows.toDF("grp", "c"), col("grp"), col("c"))
      .agg(sum("chi2_contrib")).head().getDouble(0)
    assert(chi < 1.0, s"near-Benford sample scored $chi")
  }

  test("iqrOutliers: Tukey fences catch planted extremes only") {
    val vals = (1 to 100).map(_.toDouble) :+ 1000.0 :+ -1000.0
    val df = vals.map(("g", _)).toDF("grp", "v")
    val r = DataQuality.iqrOutliers(df, col("grp"), col("v")).head()
    assert(r.getAs[Long]("n_rows") == 102L)
    assert(r.getAs[Long]("n_outliers") == 2L)
    assert(r.getAs[Double]("q1") < r.getAs[Double]("q3"))
    assert(r.getAs[Double]("lo_fence") < r.getAs[Double]("q1"))
  }

  test("madOutliers: hand-computed odd/even/degenerate ladders") {
    // odd n=5: [1,2,3,4,100] -> median 3 (med2=6), deviations
    // {2,1,0,1,97} -> MAD 1 (mad4=4); Hampel |x-3| > 3 flags only 100
    val odd = DataQuality.madOutliers(
      Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("grp", "c"),
      col("grp"), col("c")).head()
    assert(odd.getAs[Long]("n") == 5L)
    assert(odd.getAs[Long]("med2") == 6L)
    assert(odd.getAs[Double]("median") == 3.0)
    assert(odd.getAs[Long]("mad4") == 4L)
    assert(odd.getAs[Double]("mad") == 1.0)
    assert(odd.getAs[Long]("n_outliers") == 1L)
    // even n=4: [1,2,3,4] -> median 2.5 (med2=5), dev2 {3,1,1,3}
    // -> mad4 = 1+3 = 4 (MAD 1); no |x-2.5| exceeds 3
    val even = DataQuality.madOutliers(
      Seq(1L, 2L, 3L, 4L).map(("g", _)).toDF("grp", "c"),
      col("grp"), col("c")).head()
    assert(even.getAs[Long]("med2") == 5L)
    assert(even.getAs[Double]("median") == 2.5)
    assert(even.getAs[Long]("mad4") == 4L)
    assert(even.getAs[Long]("n_outliers") == 0L)
    // degenerate MAD=0 (majority identical): [5,5,5,9] -> med 5,
    // mad 0 -> ANY deviation flags (2*dev2 > 0)
    val degen = DataQuality.madOutliers(
      Seq(5L, 5L, 5L, 9L).map(("g", _)).toDF("grp", "c"),
      col("grp"), col("c")).head()
    assert(degen.getAs[Long]("mad4") == 0L)
    assert(degen.getAs[Long]("n_outliers") == 1L)
  }

  test("contingency: exact-zero contributions under independence; zero cells carry mass") {
    // perfectly proportional 2x2 (10/20 vs 20/40): every e is exact
    // and every contribution is exactly 0.0
    val ind = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(20)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val rInd = DataQuality.contingency(ind.toDF("a0", "b0"),
      col("a0"), col("b0"))
    assert(rInd.count() == 4L)
    assert(rInd.agg(sum("chi2_contrib")).head().getDouble(0) == 0.0)
    // perfect association (only diagonal observed): the grid emits the
    // two ZERO cells and V = sqrt(chi2 / (n * (min(R,C)-1))) = 1 exactly
    val assoc = Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q"))
    val rAssoc = DataQuality.contingency(assoc.toDF("a0", "b0"),
      col("a0"), col("b0"))
    assert(rAssoc.count() == 4L)
    assert(rAssoc.where(col("n_obs") === 0L).count() == 2L)
    val v = DataQuality.cramersV(rAssoc).head()
    assert(v.getAs[Double]("v") == 1.0)
    val vInd = DataQuality.cramersV(rInd).head()
    assert(vInd.getAs[Double]("v") == 0.0)
  }

  test("streaming Benford/MAD/contingency folds equal the one-shot batch reports") {
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val bBen = DataQuality.benford(ev, col("event_type"), cents)
    val sBen = graft.streaming.EventStreams.benfordMonitorSink(spark, dir)
    assert(sBen.exceptAll(bBen).isEmpty && bBen.exceptAll(sBen).isEmpty)
    val bMad = DataQuality.madOutliers(ev, col("event_type"), cents)
    val sMad = graft.streaming.EventStreams.madMonitorSink(spark, dir)
    assert(sMad.exceptAll(bMad).isEmpty && bMad.exceptAll(sMad).isEmpty)
    val bCon = DataQuality.contingency(ev, col("event_type"),
      concat(lit("u"), (col("user_id") % 4).cast("string")))
    val sCon = graft.streaming.EventStreams.contingencyMonitorSink(spark, dir)
    assert(sCon.exceptAll(bCon).isEmpty && bCon.exceptAll(sCon).isEmpty)
  }

  test("iqrOutliersFromCounts matches the type-7 quantile definition") {
    // 8 values => h_q1 = 7/4 = 1.75: q1 = x2 + 0.75*(x3-x2);
    // h_q3 = 21/4 = 5.25: q3 = x6 + 0.25*(x7-x6). One far outlier.
    val vals = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 100000L)
    val df = vals.toDF("c").withColumn("grp", lit("g"))
    val out = DataQuality.iqrOutliersCents(df, col("grp"), col("c"))
      .collect().head
    val q1 = 20.0 + 0.75 * 10.0   // 27.5
    val q3 = 60.0 + 0.25 * 10.0   // 62.5
    val lo = q1 - (q3 - q1) * 1.5 // -25.0
    val hi = q3 + (q3 - q1) * 1.5 // 115.0
    assert(out.getAs[Double]("q1") == q1 && out.getAs[Double]("q3") == q3)
    assert(out.getAs[Double]("lo_fence") == lo &&
      out.getAs[Double]("hi_fence") == hi)
    assert(out.getAs[Long]("n_rows") == 8L &&
      out.getAs[Long]("n_outliers") == 1L)
  }

  test("iqrOutliersFromCounts: duplicates weight positions; n=1 degenerates") {
    // counts-weighted: {5 x3, 9 x1} => n=4, q1 pos: h=0.75 -> x1+(3/4)(x2-x1)
    // over sorted (5,5,5,9): x1=5,x2=5 => q1=5; q3: h=2.25 -> x3 + .25*(x4-x3)=6
    val df = Seq(5L, 5L, 5L, 9L).toDF("c").withColumn("grp", lit("g"))
    val r = DataQuality.iqrOutliersCents(df, col("grp"), col("c"))
      .collect().head
    assert(r.getAs[Double]("q1") == 5.0 && r.getAs[Double]("q3") == 6.0)
    val one = Seq(42L).toDF("c").withColumn("grp", lit("solo"))
    val r1 = DataQuality.iqrOutliersCents(one, col("grp"), col("c"))
      .collect().head
    assert(r1.getAs[Double]("q1") == 42.0 && r1.getAs[Double]("q3") == 42.0 &&
      r1.getAs[Long]("n_outliers") == 0L)
  }

  test("streaming outlierMonitorSink equals the one-shot cents report") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.io.Tables.events(spark, dir)
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val b = DataQuality.iqrOutliersCents(ev, col("event_type"), cents)
    val s = graft.streaming.EventStreams.outlierMonitorSink(spark, dir)
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
  }

  test("qqFromCounts reports NULL deciles for a one-sided group") {
    // grp "both" has rows on both sides; grp "baseonly" only baseline:
    // its cur_cents deciles must be NULL, not the base side's min
    // (ADVICE r9: 10·cum >= q·0 was trivially true)
    val df = Seq(
      ("both", 10L, false), ("both", 20L, true),
      ("baseonly", 30L, false), ("baseonly", 40L, false)
    ).toDF("grp", "v", "cur")
    val out = DataQuality.quantileShift(df, col("grp"), col("v"), col("cur"))
      .where(col("grp") === "baseonly").collect()
    assert(out.length == 9)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("cur_cents")) &&
      r.isNullAt(r.fieldIndex("shift_cents"))))
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("base_cents"))))
  }
}
