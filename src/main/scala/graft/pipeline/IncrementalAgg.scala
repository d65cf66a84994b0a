package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance with RETRACTIONS —
  * the additive-aggregate member of the engine's incremental family
  * (exact/MinHash/setsim/fuzzy dedup, KMV, CC, triangles, decontam all
  * maintain batch-vs-standing; this maintains the groupBy itself).
  *
  * A 100 TB rollup table (per-key counts and sums) must absorb a
  * refresh batch of INSERTS and DELETES without rescanning the standing
  * corpus: the batch reduces to per-key signed deltas (one scan of the
  * BATCH only, map-side combined), and the merge is a key full-outer
  * join against the standing aggregate — O(|batch keys|) new work, with
  * the standing side streamable by key. Keys whose count reaches zero
  * drop out (the MV never carries tombstones); a count driven NEGATIVE
  * means a retraction arrived for a row the standing state never held —
  * that is pipeline corruption (a replayed or mis-keyed delete), and it
  * raises at execution time rather than silently persisting a wrong
  * aggregate, the same guard discipline as [[Scd2.merge]].
  *
  * Exactly-once delivery of the batch is assumed (retraction algebra is
  * additive, not idempotent); pair with the engine's idempotent
  * batch-id sink pattern (`exactlyOnceParquetSink`) when replays are
  * possible. All state is exact integers (counts, cents), so refreshed
  * tables hash-gate bit-for-bit against a from-scratch recompute.
  */
object IncrementalAgg {

  /** Reduce a refresh batch to per-key signed deltas.
    * @param isDelete marks retraction rows (must identify rows
    *   previously inserted, with the same measure values)
    * @return (k, dn, dsum) */
  def delta(batch: DataFrame, key: Column, measure: Column,
      isDelete: Column): DataFrame =
    batch.groupBy(key.as("k")).agg(
      sum(when(isDelete, -1L).otherwise(1L)).as("dn"),
      sum(when(isDelete, -measure).otherwise(measure)).as("dsum"))

  /** Fold one delta table into the standing aggregate.
    * @param standing (k, n, total) — the maintained MV
    * @return (k, n, total), zero-count keys dropped, negative counts
    *   raising loudly */
  def refresh(standing: DataFrame, d: DataFrame): DataFrame =
    standing.join(d, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(0L)) +
          coalesce(col("dsum"), lit(0L))).as("total"))
      .withColumn("n",
        when(col("n") < 0L, raise_error(concat(
          lit("IncrementalAgg.refresh: count went negative for key "),
          col("k").cast("string"),
          lit(" — a retraction arrived for a row the standing state never held"))))
          .otherwise(col("n")))
      .where(col("n") > 0L)

  /** Bootstrap the standing aggregate with one full scan — the only
    * time the corpus is read end to end. */
  def bootstrap(df: DataFrame, key: Column, measure: Column): DataFrame =
    df.groupBy(key.as("k")).agg(
      count(lit(1)).as("n"), sum(measure).as("total"))
}
