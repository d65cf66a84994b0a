package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{GraphOps, PageRank}
import graft.io.Tables

/** Driver-gate queries for the OINK graph suite (SURVEY.md §2.5) over the
  * canonical derived edge list ([[Tables.edges]]). Oracle SQL shares the
  * same `edges` CTE so both engines see the identical graph.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  private def E = Tables.EdgesSql
  private val N = Tables.GraphN

  val queries: Map[String, Q] = Map(
    "g_degree" -> ((s, dir) => GraphOps.outDegree(Tables.edges(s, dir))),

    "g_degree_both" -> ((s, dir) => GraphOps.degreeBoth(Tables.edges(s, dir))),

    "g_degree_stats" -> ((s, dir) => GraphOps.degreeStats(Tables.edges(s, dir))),

    "g_degree_weight" -> ((s, dir) => GraphOps.degreeWeight(Tables.edges(s, dir))),

    "g_edge_upper" -> ((s, dir) => GraphOps.edgeUpper(Tables.edges(s, dir))),

    "g_vertex_extract" -> ((s, dir) => GraphOps.vertexExtract(Tables.edges(s, dir))),

    "g_neighbor" -> ((s, dir) => GraphOps.neighbors(Tables.edges(s, dir))),

    // Fixed-3-iteration PageRank with exact reference update semantics
    // (SURVEY.md §2.4); the oracle unrolls the same three iterations.
    "g_pagerank" -> ((s, dir) =>
      PageRank.runFixed(s, Tables.edges(s, dir), N, iterations = 3)
        .select(col("id"), round(col("rank"), 9).as("rank")))
  )

  val oracles: Map[String, String] = Map(
    "g_degree" ->
      s"""WITH edges AS ($E)
         |SELECT src AS v, count(*) AS deg FROM edges GROUP BY src""".stripMargin,

    "g_degree_both" ->
      s"""WITH edges AS ($E)
         |SELECT v, count(*) AS deg FROM (
         | SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges
         |) GROUP BY v""".stripMargin,

    "g_degree_stats" ->
      s"""WITH edges AS ($E)
         |SELECT deg, count(*) AS nvert FROM (
         | SELECT v, count(*) AS deg FROM (
         |  SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges
         | ) GROUP BY v
         |) GROUP BY deg ORDER BY deg DESC""".stripMargin,

    "g_degree_weight" ->
      s"""WITH edges AS ($E),
         | outdeg AS (SELECT src AS v, count(*) AS deg FROM edges GROUP BY src)
         |SELECT src, dst, CAST(1.0 AS DOUBLE) / deg AS weight
         |FROM edges JOIN outdeg ON src = v""".stripMargin,

    "g_edge_upper" ->
      s"""WITH edges AS ($E)
         |SELECT DISTINCT least(src, dst) AS vi, greatest(src, dst) AS vj
         |FROM edges WHERE least(src, dst) <> greatest(src, dst)""".stripMargin,

    "g_vertex_extract" ->
      s"""WITH edges AS ($E)
         |SELECT DISTINCT v FROM (
         | SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)""".stripMargin,

    "g_neighbor" ->
      s"""WITH edges AS ($E)
         |SELECT src AS v, array_to_string(list_sort(list(dst)), ',') AS nbrs
         |FROM edges GROUP BY src""".stripMargin,

    "g_pagerank" -> pagerankSql(3)
  )

  /** Unrolled n-iteration PageRank oracle mirroring PageRank.runFixed:
    * per iteration, sum/dangling from the pre-normalized vector,
    * normalize (skipped at iteration 0), contributions old_pr/outdeg,
    * pr = α·h + α·dangling/n + (1−α)/n. */
  def pagerankSql(iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"WITH edges AS ($E),\n")
    sb.append(s"outdeg AS (SELECT src AS id, count(*) AS outdeg FROM edges GROUP BY src),\n")
    sb.append(s"verts AS (SELECT CAST(range AS BIGINT) AS id FROM range($N)),\n")
    sb.append("r0 AS (SELECT v.id, o.outdeg, CASE WHEN v.id = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pr\n")
    sb.append("       FROM verts v LEFT JOIN outdeg o ON v.id = o.id),\n")
    for (i <- 0 until iters) {
      val norm =
        if (i == 0) "pr AS old_pr"
        else s"pr / (SELECT s FROM s$i) AS old_pr"
      sb.append(s"s${i} AS (SELECT sum(pr) AS s, sum(CASE WHEN outdeg IS NULL THEN pr ELSE 0.0 END) AS d FROM r$i),\n")
      sb.append(s"n$i AS (SELECT id, outdeg, $norm FROM r$i),\n")
      sb.append(s"c$i AS (SELECT e.dst AS id, sum(n.old_pr / n.outdeg) AS h\n")
      sb.append(s"        FROM edges e JOIN n$i n ON e.src = n.id GROUP BY e.dst),\n")
      sb.append(s"r${i + 1} AS (SELECT n.id, n.outdeg,\n")
      sb.append(s"        0.85 * coalesce(c.h, CAST(0.0 AS DOUBLE)) + ((0.85 * (SELECT d FROM s$i) / $N) + (0.15 / CAST($N AS DOUBLE))) AS pr\n")
      sb.append(s"        FROM n$i n LEFT JOIN c$i c ON n.id = c.id)")
      sb.append(if (i == iters - 1) "\n" else ",\n")
    }
    sb.append(s"SELECT id, round(pr, 9) AS rank FROM r$iters")
    sb.toString
  }
}
