package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the shuffle-elimination lever for repeated
  * big-big joins and aggregations at corpus scale.
  *
  * A fact table bucketed (and sorted) by its join/group key is written
  * once with one exchange; every subsequent equi-join between two tables
  * bucketed on their join keys with the SAME bucket count, and every
  * aggregation keyed on the bucket column, then runs with ZERO shuffle —
  * Catalyst recognizes the `HashPartitioning(bucketCol, n)` output
  * partitioning of the `FileSourceScanExec` and drops the Exchange
  * (BucketingSpec asserts the plans). At 100 TB this converts the
  * dominant repeated cost (full-fact-table exchange per query) into a
  * one-time write cost, the same trade the reference's `aggregate`-once/
  * `convert`-many pipelines make around a persistent KMV layout
  * (`/root/reference/mapreduce-7Apr14/src/mapreduce.cpp:659-705`).
  *
  * Bucketed writes go through the catalog (`saveAsTable` — Spark's
  * path-only writer cannot record bucket metadata); pass the table name,
  * not a path. Bucket-pruning on point predicates
  * (`spark.sql.sources.bucketing.enabled`, on by default) rides free.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed by `bucketCol` into
    * `numBuckets`, sorted within buckets by `sortCols` (defaults to the
    * bucket column — sorted buckets let the join pick sort-merge without
    * a per-task sort). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** True iff the physical plan contains no shuffle exchange — the
    * property a co-located bucketed join/aggregation must have. Goes
    * through [[graft.plans.PlanWalk]], which sees through the AQE
    * wrappers a naive `plan.exists` silently misses. */
  def shuffleFree(df: DataFrame): Boolean =
    !graft.plans.PlanWalk.exists(df.queryExecution.executedPlan)(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
}
