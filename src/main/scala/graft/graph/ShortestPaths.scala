package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source shortest paths — the reference's `sssp`
  * (`/root/reference/oink/sssp.cpp:49-186`): iterative relaxation — merge
  * newly discovered paths into the vertex state, keep the shortest per
  * vertex (`pick_shortest`, `sssp.cpp:244+`), expand along out-edges,
  * repeat until no distance improves.
  *
  * Spark-first: frontier-based Bellman-Ford over DataFrames. Only the
  * vertices whose distance improved last round (`frontier`) are expanded,
  * so per-round work tracks the BFS wavefront, not the whole graph —
  * the same effect as the reference's "changed" flags. Edges are
  * partitioned once on `src` and reused every round.
  */
object ShortestPaths {

  /** @param edges  (src, dst) plus optional `weight` column (default 1.0)
    * @param source source vertex id
    * @return (v BIGINT, dist DOUBLE) for reachable vertices only —
    *         the reference likewise only tracks discovered vertices.
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      source: Long,
      maxIter: Int = 200): DataFrame = {
    import spark.implicits._
    val weighted =
      (if (edges.columns.contains("weight")) edges.select(col("src"), col("dst"), col("weight").cast("double"))
       else edges.select(col("src"), col("dst"), lit(1.0).as("weight")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)

    var dist = Seq((source, 0.0)).toDF("v", "dist")
    var frontier = dist
    var iter = 0
    var active = 1L
    while (active > 0 && iter < maxIter) {
      val candidates = weighted
        .join(frontier, weighted("src") === frontier("v"))
        .select(col("dst").as("v"), (col("dist") + col("weight")).as("dist"))
      // localCheckpoint every round: `dist` appears twice in the
      // round plan (union + improvement anti-check) — truncate or the
      // logical tree doubles per round (see PageRank.run). Lazy: the
      // improvement join below scans all of `merged`, so the count
      // action materializes both frames in a single job per round.
      val merged = dist.union(candidates)
        .groupBy("v").agg(min("dist").as("dist"))
        .localCheckpoint(false)
      // improved = vertices whose best distance changed this round.
      // No checkpoint needed: its lineage is one join of two already-
      // checkpointed frames, so the plan stays shallow; persist + the
      // count action below materializes it in one job instead of the
      // two (checkpoint job + count job) a localCheckpoint would take.
      val improved = merged.join(dist.withColumnRenamed("dist", "old"), Seq("v"), "left")
        .where(col("old").isNull || col("dist") < col("old"))
        .select("v", "dist")
        .persist(StorageLevel.MEMORY_AND_DISK)
      active = improved.count()
      // old dist is checkpoint-backed: Dataset.unpersist cannot see its
      // RDD-level blocks, so release goes through the bridge. The
      // frontier is plain-persisted — normal unpersist applies.
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(dist)
      frontier.unpersist(false)
      dist = merged
      frontier = improved
      iter += 1
    }
    frontier.unpersist(false) // the last round's improved frame
    weighted.unpersist(false)
    dist
  }

  /** The reference's randomized source selection made deterministic:
    * `sssp ncnt seed` seeds `srand48(seed)` and draws ncnt sources from
    * the valid (non-singleton) vertex list (`oink/sssp.cpp:54`,
    * `get_good_sources`). We draw index `hash60(seed|i) % |V|` into the
    * id-ordered vertex list — partitioning-independent, identical in
    * the DuckDB oracle. Ranks come from a distributed sortBy +
    * zipWithIndex (range-partitioned, like readValidated) — a global
    * row_number window would funnel all of |V| through one task. */
  def seededSources(edges: DataFrame, seed: Long, count: Int): Seq[Long] = {
    val verts = GraphOps.vertexExtract(edges)
    val n = verts.count()
    val wanted = (0 until count)
      .map(i => graft.functions.Hashing.hash60Local(s"$seed|$i") % n).toSet
    verts.select("v").rdd.map(_.getLong(0)).sortBy(identity)
      .zipWithIndex()
      .collect { case (v, rn) if wanted.contains(rn) => v }
      .collect().toSeq.sorted.distinct
  }

  /** Multi-source variant — the reference's `sssp ncnt seed` runs ncnt
    * searches (`oink/sssp.cpp:49-186`); here ALL sources advance in ONE
    * iterative pass with state keyed on (source, v), so the edge table
    * is scanned once per round regardless of source count. Sources are
    * explicit (see [[seededSources]] for the reference's randomized
    * contract — determinism first, `luby`-style). */
  def runMulti(
      spark: SparkSession,
      edges: DataFrame,
      sources: Seq[Long],
      maxIter: Int = 200): DataFrame = {
    import spark.implicits._
    val weighted =
      (if (edges.columns.contains("weight")) edges.select(col("src"), col("dst"), col("weight").cast("double"))
       else edges.select(col("src"), col("dst"), lit(1.0).as("weight")))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)

    var dist = sources.map(s => (s, s, 0.0)).toDF("source", "v", "dist")
    var frontier = dist
    var iter = 0
    var active = 1L
    while (active > 0 && iter < maxIter) {
      val candidates = weighted
        .join(frontier, weighted("src") === frontier("v"))
        .select(col("source"), col("dst").as("v"), (col("dist") + col("weight")).as("dist"))
      val merged = dist.union(candidates)
        .groupBy("source", "v").agg(min("dist").as("dist"))
        .localCheckpoint(false) // fused with the count job, see run()
      // shallow lineage off two checkpointed frames — persist + count
      // materializes in one job (see run() above)
      val improved = merged
        .join(dist.withColumnRenamed("dist", "old"), Seq("source", "v"), "left")
        .where(col("old").isNull || col("dist") < col("old"))
        .select("source", "v", "dist")
        .persist(StorageLevel.MEMORY_AND_DISK)
      active = improved.count()
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(dist) // see run()
      frontier.unpersist(false)
      dist = merged
      frontier = improved
      iter += 1
    }
    frontier.unpersist(false) // the last round's improved frame
    weighted.unpersist(false)
    dist
  }
}
