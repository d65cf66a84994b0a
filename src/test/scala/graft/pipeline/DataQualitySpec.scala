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
