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
    *  - keys new to the dimension: appended open at `ts`. */
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
    val nowClosed = branch(
      col(key).isNotNull && col(s"u_$key").isNotNull && !samePayload,
      col(key), payload.map(col), col("valid_from"), lit(ts))
    val newVersions = branch(
      col(s"u_$key").isNotNull && (col(key).isNull || !samePayload),
      col(s"u_$key"), payload.map(c => col(s"u_$c")), lit(ts), lit(OpenTs))
    val merged = open.join(u, col(key) === col(s"u_$key"), "full_outer")
      .select(explode(filter(array(untouched, nowClosed, newVersions),
        _.isNotNull)).as("r"))
      .select(outCols.map(c => col(s"r.$c")): _*)
    closed.unionAll(merged)
  }

  /** Point-in-time view: the rows valid at `asOf`. */
  def snapshot(dim: DataFrame, asOf: Long): DataFrame =
    dim.where(col("valid_from") <= asOf && col("valid_to") > asOf)
}
