package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distributed greedy graph coloring — Jones-Plassmann rounds over the
  * portable hash60 priority (Jones & Plassmann 1993, "A parallel graph
  * coloring heuristic"). Natural companion to the reference's
  * `luby_find` (`/root/reference/mapreduce-7Apr14/oink/luby_find.cpp:53-91`):
  * Luby's MIS and JP coloring are the same independent-set peeling idea,
  * and with FIXED per-vertex priorities both converge to the result of
  * the sequential greedy pass in ascending (priority, id) order — which
  * is exactly what the recursive-CTE oracle replays.
  *
  * A vertex colors itself in the round where every still-uncolored
  * neighbor has LOWER priority; its color is the mex (minimum excluded
  * value) of the colors its higher-priority neighbors already took.
  * Adjacent vertices can never both be ready in one round, so parallel
  * assignment is race-free by construction, and the fixpoint equals the
  * sequential greedy coloring — deterministic per seed, independent of
  * partitioning.
  *
  * Scale shape: one |V|-row state frame and the undirected edge frame;
  * each round is (a) one join to find blocked vertices, (b) one
  * join+group to collect ready vertices' neighbor colors (mex is a
  * fold over a per-vertex sorted color set, bounded by degree), (c) one
  * state merge — all keyed on the vertex, all shuffle-partitioned the
  * same way. Rounds are O(log n / log log n) w.h.p. for random
  * priorities; the loop follows the engine's lazy-localCheckpoint
  * discipline (constant plan depth, one job per round).
  */
object Coloring {

  /** @return (v BIGINT, color BIGINT) — the greedy coloring of the
    *         ascending (hash60(seed, v), v) order; colors are 0-based. */
  def run(spark: SparkSession, edges: DataFrame, seed: Long, maxIter: Int = 500): DataFrame =
    runCounted(spark, edges, seed, maxIter)._1

  def runCounted(spark: SparkSession, edges: DataFrame, seed: Long,
      maxIter: Int = 500): (DataFrame, Int) = {
    import org.apache.spark.sql.graftbridge.Bridge
    val und = Bridge.lazyCheckpoint(
      GraphOps.undirected(edges).repartition(col("vi")))

    var state = Bridge.lazyCheckpoint(
      GraphOps.vertexExtract(edges)
        .select(col("v"), Hashing.hash60(seed, col("v")).as("p"),
          lit(null).cast("bigint").as("color")))

    var iter = 0
    var remaining = state.where(col("color").isNull).count()
    while (remaining > 0) {
      if (iter >= maxIter) {
        Bridge.releaseCheckpoint(state)
        Bridge.releaseCheckpoint(und)
        throw new IllegalStateException(
          s"Coloring did not converge in $maxIter rounds ($remaining uncolored)")
      }
      val unc = state.where(col("color").isNull)
      // blocked: an uncolored vertex with an uncolored higher-priority
      // ((p, v) ascending) neighbor must wait for it
      val blocked = und
        .join(unc.select(col("v").as("vi"), col("p").as("pi")), "vi")
        .join(unc.select(col("v").as("vj"), col("p").as("pj")), "vj")
        .where(struct(col("pj"), col("vj")) < struct(col("pi"), col("vi")))
        .select(col("vi").as("v")).distinct()
      val ready = unc.select("v").join(blocked, Seq("v"), "left_anti")
      // mex over the colors of already-colored neighbors (every
      // higher-priority neighbor is among them once ready)
      val coloredNbr = state.where(col("color").isNotNull)
        .select(col("v").as("vj"), col("color").as("nc"))
      val nbrColors = und
        .join(ready.withColumnRenamed("v", "vi"), Seq("vi"), "left_semi")
        .join(coloredNbr, "vj")
        .groupBy(col("vi").as("v"))
        .agg(sort_array(collect_set(col("nc"))).as("cols"))
      val assigned = ready.join(nbrColors, Seq("v"), "left")
        .select(col("v"), coalesce(
          expr("aggregate(cols, CAST(0 AS BIGINT), (acc, x) -> IF(x = acc, acc + 1, acc))"),
          lit(0L)).as("nc"))
      // capped-stats checkpoint: the round plan references `state` five
      // times through inner joins, so the carried size estimate would
      // otherwise multiply per round (see Bridge.lazyCheckpoint)
      val next = Bridge.lazyCheckpoint(
        state.join(assigned, Seq("v"), "left")
          .select(col("v"), col("p"), coalesce(col("color"), col("nc")).as("color")))
      // the count materializes `next`; the previous round's blocks can go
      remaining = next.where(col("color").isNull).count()
      Bridge.releaseCheckpoint(state)
      state = next
      iter += 1
    }
    Bridge.releaseCheckpoint(und)
    (state.select("v", "color"), iter)
  }

  /** Recursive-CTE oracle: the sequential greedy coloring in ascending
    * (hash60(seed, v), v) order over `edgesSql`'s (src, dst) rows —
    * provably the JP fixpoint for fixed priorities. Colors are carried
    * as a rank-indexed list; the mex is the first non-negative integer
    * missing from the already-assigned neighbor colors. */
  def oracleSql(edgesSql: String, seed: Long): String =
    s"""WITH RECURSIVE edges AS ($edgesSql),
       |eu AS (SELECT DISTINCT least(src,dst) AS vi, greatest(src,dst) AS vj
       |       FROM edges WHERE src <> dst),
       |und AS (SELECT vi, vj FROM eu UNION ALL SELECT vj AS vi, vi AS vj FROM eu),
       |verts AS (SELECT DISTINCT v FROM
       |  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
       |rk AS (SELECT v, CAST(row_number() OVER (ORDER BY p, v) AS BIGINT) AS rk
       |       FROM (SELECT v, ${Hashing.hash60Sql(seed, "v")} AS p FROM verts)),
       |nbrs AS (SELECT r1.rk AS rk, list(r2.rk) AS nb
       |         FROM und u JOIN rk r1 ON u.vi = r1.v JOIN rk r2 ON u.vj = r2.v
       |         GROUP BY r1.rk),
       |g(i, colors) AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST([] AS BIGINT[]) AS colors
       |  UNION ALL
       |  SELECT g.i + 1,
       |    list_append(g.colors, (
       |      [k FOR k IN range(CAST(0 AS BIGINT),
       |           CAST(coalesce(len(n.nb), 0) + 1 AS BIGINT))
       |         IF NOT list_contains(
       |           coalesce([g.colors[r] FOR r IN n.nb IF r <= g.i], []), k)])[1])
       |  FROM g LEFT JOIN nbrs n ON n.rk = g.i + 1
       |  WHERE g.i < (SELECT count(*) FROM verts))
       |SELECT r.v, f.colors[r.rk] AS color
       |FROM rk r, (SELECT colors FROM g ORDER BY i DESC LIMIT 1) f""".stripMargin
}
