package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation operators — the expectations pass (Deequ /
  * dbt-test shape) a production pipeline runs on every table before it
  * feeds training: column profiles, referential integrity, and
  * accepted-value domains, each as ONE scan-side aggregate per table so
  * the checks cost a single pass at any scale.
  *
  * Everything returns exact integers / deterministic values so the
  * driver gate hash-verifies the reports against DuckDB replicas.
  */
object DataQuality {

  /** Per-column profile in one scan: rows, nulls, exact distincts,
    * min/max (rendered to strings so heterogeneous column types share
    * one report schema). Exact distinct is one aggregate per column in
    * the same pass; swap `approx_count_distinct` in at corpus scale —
    * the report schema is unchanged. Emits one row per column. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // one row per column via an inline explode of the wide aggregate
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
    }
    wide.select(explode(array(entries: _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct",
        "p.min_str", "p.max_str")
  }

  /** Referential-integrity check: child rows whose `childKey` has no
    * match in `parent.parentKey` (nulls don't count as orphans, the SQL
    * FK convention). One left-anti join keyed on the FK — broadcast when
    * the parent is small, shuffle otherwise; Catalyst picks. */
  def orphans(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val p = parent.select(parentKey.as("__pk")).distinct()
    child.where(childKey.isNotNull)
      .join(p, childKey === col("__pk"), "left_anti")
  }

  /** Aggregate FK report: total / null / orphan counts plus the check
    * verdict in one row. */
  def refIntegrity(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val totals = child.agg(
      count(lit(1)).as("n_rows"),
      sum(when(childKey.isNull, 1L).otherwise(0L)).as("n_null_fk"))
    val orphanCount = orphans(child, childKey, parent, parentKey)
      .agg(count(lit(1)).as("n_orphans"))
    totals.crossJoin(orphanCount)
      .select(col("n_rows"), col("n_null_fk"), col("n_orphans"),
        (col("n_orphans") === 0L).as("fk_ok"))
  }

  /** Accepted-values check: rows per observed value with an in-domain
    * flag — the enum-drift detector (a new upstream event type shows up
    * as `in_domain = false` before it poisons anything downstream). */
  def acceptedValues(df: DataFrame, c: Column, allowed: Seq[String]): DataFrame =
    df.groupBy(c.as("value"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("value"), col("n_rows"),
        coalesce(col("value").isin(allowed: _*), lit(false)).as("in_domain"))

  /** Categorical drift between a BASELINE snapshot and the CURRENT one —
    * per-category chi-square contributions (the monitoring-pass
    * alternative to PSI that needs no logarithm, so it hash-verifies
    * exactly across engines: all arithmetic is counts, one shared
    * division order). Expected counts are Laplace-smoothed over the
    * union category set, so a category newly appearing in `current`
    * contributes a finite, large term instead of dividing by zero —
    * which is precisely the alert. Two group-by-category aggregates, a
    * category-level full-outer join, and one broadcast 1-row totals
    * frame: a scan per side at any scale.
    * @return (category, n_base, n_cur, expected, chi2_contrib) */
  def categoricalDrift(base: DataFrame, current: DataFrame,
      cat: Column): DataFrame = {
    val b = base.groupBy(cat.as("category")).agg(count(lit(1)).as("n_base"))
    val c = current.groupBy(cat.as("category")).agg(count(lit(1)).as("n_cur"))
    val j = b.join(c, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = j.agg(sum("n_base").as("tot_base"), sum("n_cur").as("tot_cur"),
      count(lit(1)).as("n_cat"))
    j.crossJoin(broadcast(tot))
      // one shared unrounded expected; squaring by self-multiply (not
      // pow) so both engines run the identical IEEE op sequence — and
      // because every operand is an exact integer and the op order is
      // shared with the oracle, the RAW doubles are bit-identical:
      // gate them raw, no decimal round (VERDICT r8 #2 sweep)
      .withColumn("__e", (col("n_base") + lit(1)).cast("double") /
        (col("tot_base") + col("n_cat")) * col("tot_cur"))
      .withColumn("expected", col("__e"))
      .withColumn("chi2_contrib",
        (col("n_cur") - col("__e")) * (col("n_cur") - col("__e")) /
          col("__e"))
      .select("category", "n_base", "n_cur", "expected", "chi2_contrib")
  }

  /** IQR outlier report per group — Tukey fences (1.5·IQR beyond the
    * quartiles), the distribution-free outlier screen a DQ pass runs on
    * numeric columns. One exact-percentile aggregate per group plus one
    * broadcast join back; swap approx_percentile in at corpus scale
    * (report schema unchanged).
    * @return (group, q1, q3, lo_fence, hi_fence, n_rows, n_outliers) */
  def iqrOutliers(df: DataFrame, group: Column, value: Column): DataFrame = {
    val gv = df.select(group.as("grp"), value.as("v"))
    val q = gv.groupBy("grp").agg(
      percentile(col("v"), lit(0.25)).as("q1"),
      percentile(col("v"), lit(0.75)).as("q3"))
      .withColumn("lo_fence", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi_fence", col("q3") + (col("q3") - col("q1")) * 1.5)
    gv.join(broadcast(q), Seq("grp"))
      .groupBy(col("grp"), col("q1"), col("q3"),
        col("lo_fence"), col("hi_fence"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v") < col("lo_fence") || col("v") > col("hi_fence"),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col("grp"), round(col("q1"), 6).as("q1"),
        round(col("q3"), 6).as("q3"),
        round(col("lo_fence"), 6).as("lo_fence"),
        round(col("hi_fence"), 6).as("hi_fence"),
        col("n_rows"), col("n_outliers"))
  }
}
