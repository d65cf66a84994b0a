package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the incremental-corpus-refresh
  * shape: a dimension snapshot keeps every historical version of a row
  * with `[valid_from, valid_to)` validity, and each refresh batch closes
  * changed rows and appends their new versions. For a training corpus
  * this is the re-crawl story: document text changes over time, and
  * dataset builds want both "latest" and "as of t" views without
  * rewriting history.
  *
  * Scale shape: ONE full-outer shuffle join between the open slice and
  * the update batch per refresh (both sides hash-partitioned on the
  * key); closed history is never touched (append-only), so the cost is
  * O(open + batch), not O(history). The reference has no notion of
  * updates (its KV multisets are build-once); this is engine extension
  * surface.
  */
object Scd2 {

  /** `valid_to` sentinel for open (current) rows — a real BIGINT rather
    * than NULL so row hashing, sorting, and the `valid_to = OpenTs`
    * pruning predicate behave identically in every engine. */
  val OpenTs: Long = Long.MaxValue

  /** Merge `updates` (one row per key: the key column + payload columns)
    * into `dim` (key + payload + valid_from/valid_to) effective at `ts`:
    *  - open rows with no update, and all closed rows: unchanged;
    *  - open rows whose payload differs from the update: closed at `ts`,
    *    new open version appended;
    *  - open rows whose payload equals the update: unchanged (idempotent
    *    re-delivery is a no-op);
    *  - keys new to the dimension: appended open at `ts`.
    *
    * Out-of-order guard: closing an open row requires `ts` strictly after
    * its `valid_from` — a batch older than the open version would emit an
    * inverted `[valid_from, ts)` interval and silently corrupt history.
    * The violation is detected PER ROW at execution time (a `raise_error`
    * branch that costs nothing on the in-order path — no extra action, no
    * driver round-trip) and fails the job with the offending key; route
    * late batches through [[mergeLate]] instead. */
  def merge(dim: DataFrame, updates: DataFrame, key: String,
      payload: Seq[String], ts: Long): DataFrame = {
    val outCols = Seq(key) ++ payload ++ Seq("valid_from", "valid_to")
    // explicit projection on BOTH union branches: unionAll is positional,
    // and the caller's dim may carry any column order
    val closed = dim.where(col("valid_to") =!= OpenTs)
      .select(outCols.map(col): _*)
    val open = dim.where(col("valid_to") === OpenTs)
    val u = updates.select(
      (col(key).as(s"u_$key") +: payload.map(c => col(c).as(s"u_$c"))): _*)
    val samePayload: Column = payload
      .map(c => col(c) <=> col(s"u_$c")).reduce(_ && _)

    // The full-outer join runs ONCE: each joined row classifies into its
    // output kind(s) inside a single projection (an unchanged open row
    // yields one struct, a changed one yields closed + new version), and
    // explode flattens them — three .where() branches over the same join
    // would execute the sort-merge three times.
    def branch(cond: Column, keyC: Column, payloadC: Seq[Column],
        vf: Column, vt: Column): Column =
      when(cond, struct(
        (Seq(keyC.as(key)) ++ payload.zip(payloadC).map { case (n, c) => c.as(n) } ++
          Seq(vf.as("valid_from"), vt.as("valid_to"))): _*))
    val untouched = branch(
      col(s"u_$key").isNull || (col(key).isNotNull && samePayload),
      col(key), payload.map(col), col("valid_from"), col("valid_to"))
    // in-order: valid_from < ts; otherwise the coalesce falls through to
    // raise_error — evaluated only on violating rows (codegen
    // short-circuits), so the guard is free when batches arrive in order
    val guardedCloseTs = coalesce(
      when(col("valid_from") < lit(ts), lit(ts)),
      raise_error(format_string(
        s"SCD2 out-of-order merge: batch ts=$ts is not after open " +
          "valid_from=%s for key %s; use Scd2.mergeLate for historical " +
          "backfill", col("valid_from"), col(key).cast("string"))).cast("long"))
    val nowClosed = branch(
      col(key).isNotNull && col(s"u_$key").isNotNull && !samePayload,
      col(key), payload.map(col), col("valid_from"), guardedCloseTs)
    val newVersions = branch(
      col(s"u_$key").isNotNull && (col(key).isNull || !samePayload),
      col(s"u_$key"), payload.map(c => col(s"u_$c")), lit(ts), lit(OpenTs))
    val merged = open.join(u, col(key) === col(s"u_$key"), "full_outer")
      .select(explode(filter(array(untouched, nowClosed, newVersions),
        _.isNotNull)).as("r"))
      .select(outCols.map(c => col(s"r.$c")): _*)
    closed.unionAll(merged)
  }

  /** Historical backfill — the rewind path for batches that arrive LATE
    * (effective `ts` earlier than versions already written). A late crawl
    * at `ts` asserts "the payload was X at time ts"; the version covering
    * `ts` splits around it:
    *  - version `[vf, vt)` covering `ts` with a differing payload →
    *    `[vf, ts)` keeps the old payload (dropped when `vf == ts`) and
    *    `[ts, vt)` carries the new one; later versions are untouched —
    *    they are later observations and still win from their `valid_from`;
    *  - covering version with the same payload: no-op (idempotent);
    *  - `ts` before the key's FIRST version: prepended as `[ts, firstVf)`;
    *  - keys new to the dimension: open `[ts, OpenTs)`.
    *
    * Scale shape: unlike [[merge]] this must see the FULL history of the
    * touched keys (the covering version may be closed), so it joins the
    * whole dimension — O(history + batch), one shuffle join plus one
    * window exchange for the first-version probe. That cost is exactly
    * why [[merge]] guards instead of silently taking this path: in-order
    * refreshes stay O(open + batch). */
  def mergeLate(dim: DataFrame, updates: DataFrame, key: String,
      payload: Seq[String], ts: Long): DataFrame = {
    val outCols = Seq(key) ++ payload ++ Seq("valid_from", "valid_to")
    val u = updates.select(
      (col(key).as(s"u_$key") +: payload.map(c => col(c).as(s"u_$c"))): _*)
    val samePayload: Column = payload
      .map(c => col(c) <=> col(s"u_$c")).reduce(_ && _)
    // "this version is hit by a late update": BOTH sides present (a
    // missing update would make !samePayload vacuously true against the
    // NULL payload) and the version interval covers ts
    val covers = col(key).isNotNull && col(s"u_$key").isNotNull &&
      col("valid_from") <= ts && col("valid_to") > ts

    def branch(cond: Column, keyC: Column, payloadC: Seq[Column],
        vf: Column, vt: Column): Column =
      when(cond, struct(
        (Seq(keyC.as(key)) ++ payload.zip(payloadC).map { case (n, c) => c.as(n) } ++
          Seq(vf.as("valid_from"), vt.as("valid_to"))): _*))

    // one key-equi join against the WHOLE dimension (every version of a
    // touched key joins its update row; classification picks the covering
    // one), then a key-partitioned window finds each key's first version
    // for the prepend case
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(coalesce(col(key), col(s"u_$key")))
    // window output materialized as a column: a window expression cannot
    // sit inline under the explode projection
    val joined = dim.join(u, col(key) === col(s"u_$key"), "full_outer")
      .withColumn("__first_vf", min(col("valid_from")).over(w))
    val firstVf = col("__first_vf")

    val untouched = branch(
      col(key).isNotNull &&
        (col(s"u_$key").isNull || !covers || samePayload),
      col(key), payload.map(col), col("valid_from"), col("valid_to"))
    val head = branch(covers && !samePayload && col("valid_from") < ts,
      col(key), payload.map(col), col("valid_from"), lit(ts))
    val backfill = branch(covers && !samePayload,
      col(s"u_$key"), payload.map(c => col(s"u_$c")), lit(ts), col("valid_to"))
    // prepend attaches to the key's first version row so it emits exactly
    // once per key; `ts < firstVf` is false once the backfill exists, so
    // re-delivery is a no-op
    val prepend = branch(
      col(key).isNotNull && col(s"u_$key").isNotNull &&
        col("valid_from") === firstVf && lit(ts) < firstVf,
      col(s"u_$key"), payload.map(c => col(s"u_$c")), lit(ts), firstVf)
    val newKey = branch(col(key).isNull,
      col(s"u_$key"), payload.map(c => col(s"u_$c")), lit(ts), lit(OpenTs))

    joined
      .select(explode(filter(array(untouched, head, backfill, prepend, newKey),
        _.isNotNull)).as("r"))
      .select(outCols.map(c => col(s"r.$c")): _*)
  }

  /** Point-in-time view: the rows valid at `asOf`. */
  def snapshot(dim: DataFrame, asOf: Long): DataFrame =
    dim.where(col("valid_from") <= asOf && col("valid_to") > asOf)

  /** As-of join: enrich each fact row with the dimension version valid
    * at that row's own timestamp — `fact.ts ∈ [valid_from, valid_to)`.
    * Because SCD2 intervals partition the timeline per key, every fact
    * matches at most one version, so this is an ordinary inner hash join
    * on the key with the interval predicate as a post-join filter — both
    * sides hash-partition on the key and only same-key version rows are
    * compared (versions per key are few), NOT an interval cross product.
    * Validity columns ride along for callers that want them. */
  def asOfJoin(facts: DataFrame, dim: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val dk = s"__dim_$key"
    val d = dim.withColumnRenamed(key, dk)
    facts.join(d, facts(key) === d(dk) &&
        facts(tsCol) >= d("valid_from") && facts(tsCol) < d("valid_to"))
      .drop(dk)
  }

  /** [[asOfJoin]] on the native [[graft.plans.AsOfJoin]] operator: the
    * backward merge picks the latest version with valid_from ≤ ts in
    * one O(|facts|+|dim|) pass (no fact×version comparisons at all),
    * and the valid_to post-filter restores inner semantics — for an
    * SCD2 dim whose intervals abut it only drops facts with no version
    * at their key. Same output as [[asOfJoin]] (d_scd2_join's oracle
    * gates both). */
  def asOfJoinNative(facts: DataFrame, dim: DataFrame, key: String,
      tsCol: String): DataFrame = {
    val dk = s"__dim_$key"
    val d = dim.withColumnRenamed(key, dk)
    graft.plans.AsOfJoin.asOfJoin(facts, d,
        Seq(col(key)), Seq(col(dk)), col(tsCol), col("valid_from"))
      .where(col("valid_to") > col(tsCol))
      .drop(dk)
  }
}
