package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Thin typed operator algebra mirroring the reference MR-MPI surface
  * (`/root/reference/mapreduce-7Apr14/src/mapreduce.h:59-118`) where Spark
  * lacks a one-word equivalent. This is a library of *plan fragments*, not
  * a KV emulation: every helper stays declarative so Catalyst keeps
  * predicate pushdown / partial aggregation / whole-stage codegen.
  *
  * Mapping (SURVEY.md §2.1): `collate`→groupBy, `add`→union,
  * `compress`→partial agg (automatic), `gather(n)`→coalesce,
  * `sort_keys/values`→orderBy, `collapse`→collect_list, top-k idiom
  * (`oink/wordfreq.cpp:65-82`)→orderBy+limit (TakeOrderedAndProject).
  */
object Ops {

  /** `invert` (`/root/reference/oink/map_invert.cpp:9-15`): (k,v)→(v,k). */
  def invert(df: DataFrame): DataFrame = {
    require(df.columns.length == 2, "invert expects a 2-column (key,value) frame")
    val Array(k, v) = df.columns
    df.select(col(v), col(k))
  }

  /** `add` (`mapreduce.cpp:345-371`): append pairs of another KV. Spark
    * unions are metadata-only — no shuffle, no materialization. */
  def unionAdd(dfs: DataFrame*): DataFrame = dfs.reduce(_ union _)

  /** Distributed group-count — `collate` + `reduce_count`
    * (`oink/reduce_count.cpp:9-20`). Catalyst plans a partial (map-side)
    * aggregate before the shuffle, which is exactly the reference's
    * `compress`-then-`collate` pre-aggregation idiom. */
  def groupCount(df: DataFrame, keys: Column*): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))

  /** `cull` (`oink/reduce_cull.cpp:9-20`): dedupe on the full row. */
  def cull(df: DataFrame): DataFrame = df.distinct()

  /** Two-level histogram (`oink/histo.cpp:36-73`): frequency of
    * frequencies of `key`, descending. */
  def histogram(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("freq"))
      .orderBy(col("cnt").desc)

  /** Global top-k by `order` — the reference's per-proc-top-k +
    * gather(1) + final sort idiom (`oink/wordfreq.cpp:65-112`). Spark
    * plans `TakeOrderedAndProject`: each partition keeps only k rows
    * before the single-stage gather, so this scales to any input size. */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** `collapse`-like (`mapreduce.cpp:654-675`): one row per key carrying
    * all values as a canonically sorted array. Unlike the reference
    * (whole-partition KMV), keyed collapse stays distributed. */
  def collapseToList(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("k")).agg(sort_array(collect_list(value)).as("vals"))

  /** `sort_multivalues` (`mapreduce.cpp:2115-2265`) as a string digest:
    * values per key, sorted and joined — hashable by the oracle. */
  def collapseToSortedString(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("k"))
      .agg(concat_ws(",", sort_array(collect_list(value.cast("string")))).as("vals"))

  /** Skew-resistant two-stage aggregation for a NON-decomposable
    * aggregate (per-key value list). Decomposable aggregates (sum,
    * count, min, max) never need salting — Catalyst's map-side partial
    * aggregation already reduces a hot key to one row per input
    * partition before the shuffle. A collect_list has no bounded
    * partial form: every value of the hottest key crosses the shuffle
    * and funnels through one reducer as row-at-a-time input. Salting
    * builds the hot key's list in `salts` parallel partials so the
    * final task merges a handful of pre-assembled arrays instead of
    * millions of individual rows (the list bytes themselves still land
    * on one reducer — irreducible for an exact per-key list). Same
    * trick as the reference's CC "big zone" random scatter
    * (`cc_find.cpp:202-300`). Output: (k, vals) with vals the
    * canonically sorted comma-joined values. */
  def saltedCollapse(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.select(key.as("k"), value.as("v"),
        (spark_partition_id() % salts).as("salt"))
      .groupBy("k", "salt")
      .agg(collect_list("v").as("pv")) // stage 1: salted partial lists
      .groupBy("k")
      .agg(array_join( // stage 2: merge + canonical order
        transform(sort_array(flatten(collect_list(col("pv")))), _.cast("string")),
        ",").as("vals"))

  /** Range (interval) join: each left POINT row joined to right
    * INTERVAL rows containing it, optionally under equi-`keys`. Spark
    * plans a raw BETWEEN predicate as BroadcastNestedLoopJoin —
    * per-partition all-pairs, fatal at scale. Here intervals replicate
    * to every fixed-width bin they overlap, points hash to their single
    * bin, and the join is a plain shuffled equi-join on (keys, bin)
    * with the exact BETWEEN as a residual filter. Replication factor is
    * span/binWidth + 1 — pick binWidth near the typical interval span.
    * Domain: non-negative values (epoch micros); `div` truncation ==
    * floor there, matching the oracle's `//`.
    *
    * @param point name of the left point column
    * @param start/end names of the right interval bound columns (inclusive)
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      point: String, start: String, end: String, binWidth: Long): DataFrame = {
    val lb = left.withColumn("__bin", expr(s"$point div $binWidth"))
    val rb = right.withColumn("__bin",
      explode(sequence(expr(s"$start div $binWidth"), expr(s"$end div $binWidth"))))
    lb.join(rb, keys :+ "__bin")
      .where(col(point) >= col(start) && col(point) <= col(end))
      .drop("__bin")
  }

  /** KEYLESS interval-overlap join — two interval sets joined on
    * `[lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅` with no equi-key at all: the
    * shape Spark itself can only plan as a BroadcastNestedLoop/cartesian
    * (O(|L|·|R|) comparisons). Each interval replicates to the
    * fixed-width time bins it touches and the join runs as an ordinary
    * hash equi-join ON THE BIN; a pair overlapping several shared bins
    * is kept only in the LATER of the two start bins (`greatest` of the
    * start bins — the first bin both intervals occupy), so no distinct
    * pass is needed. Work is O(|L|+|R|+|pairs|) with replication factor
    * `len/binWidth + 1` per interval — size `binWidth` near the typical
    * interval length. Time-uniform bins hash-spread evenly; a heavily
    * overlapped hot window is inherent output skew (that bin's pairs),
    * which AQE skew-split handles at the exchange.
    *
    * Column names must be disjoint across sides (rename before calling);
    * bounds are inclusive BIGINTs (e.g. micros). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    val lb = left.withColumn("__bin",
      explode(sequence(expr(s"$lStart div $binWidth"), expr(s"$lEnd div $binWidth"))))
    val rb = right.withColumn("__bin",
      explode(sequence(expr(s"$rStart div $binWidth"), expr(s"$rEnd div $binWidth"))))
    lb.join(rb, Seq("__bin"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(
          expr(s"$lStart div $binWidth"), expr(s"$rStart div $binWidth")))
      .drop("__bin")
  }

  /** As-of join: for each left row, the most recent right value at or
    * before its timestamp, per key. Composed from window functions (the
    * Spark-first preference ladder: built-ins before custom plans) —
    * one shuffle on (key), one sort, no point lookups. Left columns:
    * (k, ts, …) and right: (k, ts, v). */
  def asofJoin(left: DataFrame, right: DataFrame,
      key: String, ts: String, value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(key), col(ts), col(value).as("__v"), lit(0).as("__side"))
    // At equal ts, right rows come first (side 0 < 1); among tied right
    // rows the ordering on __v makes the picked value deterministic.
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof_" + value, last("__v", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__v")
  }
}
