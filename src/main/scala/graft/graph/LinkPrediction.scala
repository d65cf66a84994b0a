package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg, "The
  * link-prediction problem for social networks", CIKM 2003): for every
  * NON-adjacent vertex pair (u, w) sharing at least one neighbor on the
  * simple undirected graph, the three classic scores —
  * common neighbors cn = |N(u) ∩ N(w)|,
  * Jaccard cn / |N(u) ∪ N(w)|, and
  * Adamic-Adar Σ_{v ∈ N(u) ∩ N(w)} 1/ln(deg v).
  *
  * Dataflow: candidate pairs come from the wedge join (two hops through
  * a shared center), NEVER from all-pairs — the same
  * bucketed-candidates discipline as the dedup suite
  * ([[graft.pipeline.Dedup]]): only pairs with a witness are ever
  * materialized. Wedge volume is Σ_v deg(v)², the triangle-join bound;
  * `maxCenterDegree` is the explicit hub escape hatch at the 100 TB
  * power-law tail (a 10⁶-degree hub contributes 10¹² wedges and its
  * Adamic-Adar weight 1/ln(10⁶) ≈ 0.07 is the least-informative term —
  * the standard cap), default unlimited and reported nowhere silently:
  * callers that cap see the skipped-center count in the returned plan's
  * lineage (they filtered it themselves).
  *
  * Determinism: cn and the degree sums are exact integers; Jaccard is
  * one IEEE division of exact integers (bit-identical in any engine);
  * Adamic-Adar is a float sum folded in ascending-center order over the
  * collected witness list (the [[graft.queries.GraphQueries]] harmonic
  * discipline — canonical order, so the oracle replays it exactly),
  * rounded to 9 decimals so the driver's hash never rides the last ulps.
  */
object LinkPrediction {

  /** @param maxCenterDegree drop wedge CENTERS with degree above this
    *        (hub cap; None = unlimited). Candidates lose only witnesses
    *        routed through dropped hubs.
    * @return (u, w, cn, adamic_adar, jaccard) for non-adjacent pairs
    *         with ≥1 surviving witness; u < w. */
  def run(spark: SparkSession, edges: DataFrame,
          maxCenterDegree: Option[Long] = None): DataFrame = {
    // lazy localCheckpoint (r13): upper feeds both sym orientations AND
    // the non-adjacency anti-join; sym feeds deg and both wedge sides —
    // truncate so the scan+distinct runs once, not per consumer
    val upper = GraphOps.edgeUpper(edges).localCheckpoint(false)
    val sym = upper.union(upper.select(col("vj").as("vi"), col("vi").as("vj")))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("vi").as("v")).agg(count(lit(1)).as("deg"))
    val adj = sym.select(col("vi").as("c"), col("vj").as("n"))
    val centers = maxCenterDegree match {
      case Some(cap) => adj.join(deg.where(col("deg") <= cap),
        col("c") === col("v")).select(col("c"), col("n"))
      case None => adj
    }
    val wedges = centers.as("l").join(centers.as("r"),
        col("l.c") === col("r.c") && col("l.n") < col("r.n"))
      .select(col("l.n").as("u"), col("r.n").as("w"), col("l.c").as("cv"))
    val wd = wedges.join(deg.select(col("v").as("dv"), col("deg").as("cdeg")),
      col("cv") === col("dv"))
    val pairs = wd.groupBy("u", "w").agg(
      count(lit(1)).as("cn"),
      round(aggregate(
        sort_array(collect_list(struct(col("cv").as("v"),
          (lit(1.0) / log(col("cdeg").cast("double"))).as("t")))),
        lit(0.0), (acc, x) => acc + x.getField("t")), 9).as("adamic_adar"))
    val cand = pairs.join(upper,
      pairs("u") === upper("vi") && pairs("w") === upper("vj"), "left_anti")
    cand
      .join(deg.select(col("v").as("uv"), col("deg").as("du")), col("u") === col("uv"))
      .join(deg.select(col("v").as("wv"), col("deg").as("dw")), col("w") === col("wv"))
      .select(col("u"), col("w"), col("cn"), col("adamic_adar"),
        (col("cn").cast("double") / (col("du") + col("dw") - col("cn")))
          .as("jaccard"))
  }

  /** DuckDB oracle — identical wedge candidates, sorted-fold Adamic-Adar
    * (list_reduce over the ascending witness list), exact-integer
    * Jaccard division. */
  def oracleSql(edgesCte: String): String =
    s"""WITH edges AS ($edgesCte),
       |up AS (SELECT DISTINCT least(src, dst) AS vi, greatest(src, dst) AS vj
       |       FROM edges WHERE src <> dst),
       |sym AS (SELECT vi AS c, vj AS n FROM up
       |        UNION ALL SELECT vj, vi FROM up),
       |deg AS (SELECT c AS v, count(*) AS deg FROM sym GROUP BY 1),
       |wedge AS (SELECT l.n AS u, r.n AS w, l.c AS cv
       |          FROM sym l JOIN sym r ON l.c = r.c AND l.n < r.n),
       |wd AS (SELECT u, w, cv, d.deg AS cdeg
       |       FROM wedge JOIN deg d ON d.v = wedge.cv),
       |pairs AS (
       |  SELECT u, w, count(*) AS cn,
       |    round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(
       |        list_sort(list(struct_pack(v := cv,
       |          t := CAST(1 AS DOUBLE) / ln(cdeg)))),
       |        x -> x.t)),
       |      (a, x) -> a + x), 9) AS adamic_adar
       |  FROM wd GROUP BY u, w),
       |cand AS (SELECT p.* FROM pairs p
       |         LEFT JOIN up ON up.vi = p.u AND up.vj = p.w
       |         WHERE up.vi IS NULL)
       |SELECT c.u, c.w, c.cn, c.adamic_adar,
       |  CAST(c.cn AS DOUBLE) / (du.deg + dw.deg - c.cn) AS jaccard
       |FROM cand c
       |JOIN deg du ON du.v = c.u
       |JOIN deg dw ON dw.v = c.w""".stripMargin
}
