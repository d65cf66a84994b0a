package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core extraction: the maximal subgraph in which every vertex has
  * undirected degree ≥ k (Seidman, "Network structure and minimum
  * degree", Social Networks 1983) — the classic density filter a graph
  * pipeline runs before community/centrality work, and a natural
  * extension of the reference's degree tooling
  * (`/root/reference/oink/degree.cpp`): iterate degree-count → peel
  * until no vertex falls below k.
  *
  * Spark-first peeling: each round is one degree aggregation over the
  * current canonical edge set plus two semi-joins against the surviving
  * vertex set — all shuffles are keyed on vertex id, and the edge frame
  * only ever SHRINKS, so per-round cost decays with the peel (the
  * LubyMIS active-set trick). Rounds are O(peel depth), bounded by the
  * degeneracy ordering length, not |V|.
  *
  * Plan hygiene matches the other iterative operators: the next edge
  * set is lazily localCheckpoint'ed (the logical plan references `e`
  * three times per round — degree + two semi-joins — and would double
  * without truncation), the convergence count materializes the
  * PREVIOUS round's checkpoint inside the same job, and a predecessor's
  * blocks release only after its successor materialized.
  */
object KCore {

  /** @param edges raw directed edge list (src, dst) — canonicalized to
    *              the undirected simple graph like [[GraphOps.edgeUpper]]
    * @param k     minimum degree to survive (≥ 1)
    * @return (v BIGINT, deg BIGINT): k-core members with their degree
    *         WITHIN the core (the converged edge set). Vertices outside
    *         the core (and isolated vertices) are absent. */
  def run(spark: SparkSession, edges: DataFrame, k: Int,
      maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var e = GraphOps.edgeUpper(edges)
    var curCk: DataFrame = null
    var prevCk: DataFrame = null
    var deg: DataFrame = null
    var bad = 1L
    var iter = 0
    while (bad > 0 && iter < maxIter) {
      val und = e.union(e.select(col("vj").as("vi"), col("vi").as("vj")))
      deg = und.groupBy("vi").agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select(col("vi").as("kv"))
      val next = e
        .join(keep, e("vi") === keep("kv"), "left_semi")
        .join(keep, e("vj") === keep("kv"), "left_semi")
        .localCheckpoint(false)
      // one job per round: this count computes `deg` from `e`, which is
      // the lazy checkpoint created LAST round — materializing it here
      bad = deg.where(col("deg") < k).count()
      if (prevCk != null)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(prevCk)
      prevCk = curCk
      curCk = next
      e = next
      iter += 1
    }
    if (bad > 0)
      throw new IllegalStateException(
        s"k-core did not converge within $maxIter peel rounds")
    // converged: `deg` was computed from the final edge set and every
    // surviving vertex is ≥ k. prevCk/curCk back `deg`'s lineage — the
    // caller's action reads the checkpoint blocks, so nothing released.
    deg.select(col("vi").as("v"), col("deg"))
  }
}
