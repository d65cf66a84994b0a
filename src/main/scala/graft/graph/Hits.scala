package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HITS hub/authority scoring (Kleinberg, "Authoritative sources in a
  * hyperlinked environment", JACM 1999) in its UNNORMALIZED fixed-
  * iteration form: a_{k+1}(v) = Σ_{u→v} h_k(u), h_{k+1}(v) =
  * Σ_{v→u} a_{k+1}(u), h_0 ≡ 1. Complements the engine's PageRank
  * (same power-iteration family, reference §2.4) with the in/out dual.
  *
  * Why unnormalized: per-iteration L2 normalization is the one part of
  * HITS that is float — and a GLOBAL float sum, which no fold order
  * makes cheaply deterministic distributed. Dropping it keeps every
  * score an exact BIGINT (rankings are identical — normalization is a
  * positive scalar per iteration), so the oracle matches exactly and
  * merge order is irrelevant. The price is growth ~(Σdeg)^k: 3
  * iterations peak at ~3·10^15 on the densest test graph, two orders
  * under BIGINT range, and run() caps there; callers needing more
  * rounds must rescale between iterations.
  *
  * Shape: two vertex-keyed join+sum aggregations per iteration against
  * the cached edge frame — map-side partials bound hot-vertex skew, and
  * only the O(|V|) score frame moves per round.
  */
object Hits {

  /** @return (v BIGINT, authority BIGINT, hub BIGINT) over all vertices;
    *         sources with no in-edges score authority 0, sinks hub 0. */
  def run(spark: SparkSession, edges: DataFrame, iterations: Int = 3): DataFrame = {
    // growth is ~(Σdeg/|V|)^2 per iteration: the densest test graph peaks
    // at ~3·10^15 after 3 rounds, and a 4th would pass BIGINT range —
    // the cap enforces the documented bound
    require(iterations >= 1 && iterations <= 3,
      s"unnormalized HITS overflows BIGINT past 3 iterations, got $iterations")
    val e = edges.select(col("src"), col("dst")).persist()
    val verts = GraphOps.vertexExtract(e)
    var h = verts.withColumn("s", lit(1L))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      a = e.join(h.withColumnRenamed("v", "hv"), col("src") === col("hv"))
        .groupBy(col("dst").as("v")).agg(sum("s").as("s"))
      h = e.join(a.withColumnRenamed("v", "av"), col("dst") === col("av"))
        .groupBy(col("src").as("v")).agg(sum("s").as("s"))
    }
    val out = verts
      .join(a.select(col("v").as("a_v"), col("s").as("authority")),
        col("v") === col("a_v"), "left")
      .join(h.select(col("v").as("h_v"), col("s").as("hub")),
        col("v") === col("h_v"), "left")
      .select(col("v"), coalesce(col("authority"), lit(0L)).as("authority"),
        coalesce(col("hub"), lit(0L)).as("hub"))
      .localCheckpoint(false)
    out.count()
    e.unpersist(false)
    out
  }

  /** Unrolled DuckDB oracle — the identical integer recurrence. */
  def oracleSql(edgesCte: String, iterations: Int): String = {
    val steps = (0 until iterations).map { k =>
      s"""a${k + 1} AS MATERIALIZED (
         |  SELECT e.dst AS v, sum(h.s) AS s FROM edges e
         |  JOIN h$k h ON h.v = e.src GROUP BY 1),
         |h${k + 1} AS MATERIALIZED (
         |  SELECT e.src AS v, sum(a.s) AS s FROM edges e
         |  JOIN a${k + 1} a ON a.v = e.dst GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS ($edgesCte),
       |verts AS (SELECT DISTINCT v FROM
       |  (SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges)),
       |h0 AS (SELECT v, CAST(1 AS BIGINT) AS s FROM verts),
       |$steps
       |SELECT verts.v, CAST(coalesce(a.s, 0) AS BIGINT) AS authority,
       |  CAST(coalesce(h.s, 0) AS BIGINT) AS hub
       |FROM verts
       |LEFT JOIN a$iterations a ON a.v = verts.v
       |LEFT JOIN h$iterations h ON h.v = verts.v""".stripMargin
  }
}
