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
}
