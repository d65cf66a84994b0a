package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.io.Tables
import graft.graph.PageRank
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 to
  * a DataFrame plan over the testdata tables in `dir`; `oracleSql` holds
  * the equivalent DuckDB SQL (identical column aliases — the driver sorts
  * columns by name before hashing). Queries whose semantics are not
  * SQL-expressible (iterative-until-convergence, RNG loops) are present
  * in `queries` only and get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship: reference-semantics PageRank (α=0.85, tol=1e-5) over the
    * canonical derived edge list at sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    PageRank.run(spark, Tables.edges(spark, "/root/testdata/sf0.001"),
      websize = Some(Tables.GraphN))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ GraphQueries.queries ++
      TextQueries.queries ++ PipelineQueries.queries ++ EventQueries.queries ++
      StreamingGateQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ GraphQueries.oracles ++
      TextQueries.oracles ++ PipelineQueries.oracles ++ EventQueries.oracles ++
      StreamingGateQueries.oracles
}
