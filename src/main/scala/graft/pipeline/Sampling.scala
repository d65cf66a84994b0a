package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling for training-data curation.
  *
  * Sampling at corpus scale must be reproducible (the same run
  * re-executed after a failure keeps the same rows), partitioning-
  * independent, and join-stable (two tables sampled on a shared key
  * stay aligned). Spark's `df.sample` is none of these across retries
  * and repartitions, so these operators derive the keep decision from
  * the portable [[Hashing.rand01]] of a caller-chosen key — which also
  * makes them DuckDB-oracle-verifiable. No shuffle: sampling is a
  * pushdown-friendly filter on a scan.
  */
object Sampling {

  /** Keep a row iff the key's seeded uniform draw falls below `rate`. */
  def uniform(df: DataFrame, key: Column, rate: Double, seed: Long): DataFrame =
    df.where(Hashing.rand01(seed, key) < rate)

  /** Per-stratum rates (e.g. downsample boilerplate languages, keep all
    * rare ones). `rates` maps stratum value → keep rate; `default`
    * applies to unlisted strata. The rate lookup folds into a CASE
    * expression — codegen'd, no join, no UDF. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], default: Double, seed: Long): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.where(Hashing.rand01(seed, key) < rate)
  }
}
