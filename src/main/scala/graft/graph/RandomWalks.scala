package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic random-walk corpus generation — the input DeepWalk /
  * node2vec (Perozzi et al. KDD 2014; Grover & Leskovec KDD 2016) feed
  * their skip-gram stage, generated the only way that works distributed:
  * every "random" choice is a hash of (seed, walk, step, position), the
  * same vertex-keyed derandomization the engine uses for Luby priorities
  * and R-MAT (the reference's `srand48(v + seed)` idiom) — walks are
  * reproducible under any partitioning, across retries, and in a SQL
  * replica.
  *
  * Shape: the ranked adjacency (per-source neighbor index + out-degree,
  * one window pass) is computed once and cached; each step is ONE
  * equi-join of the O(#walks) state frame against it — the next-hop
  * "choice" is part of the join key (`rn = hash % deg`), so no
  * per-vertex sampling logic exists anywhere, and a 100 TB edge table
  * costs one cached partitioning plus `length` state-sized joins.
  * Walks stop early at sinks (the join drops them), exactly like the
  * sequential algorithm.
  */
object RandomWalks {

  /** @param edges  raw directed edge list; self-loops ignored, parallel
    *               edges weight the choice like repeated neighbors
    * @param seed   derandomization seed
    * @param length walk length (steps beyond the start)
    * @return (start BIGINT, step BIGINT, v BIGINT): one walk per vertex
    *         with out-edges; row (s, k, v) = walk from s is at v after
    *         k steps. */
  def run(spark: SparkSession, edges: DataFrame, seed: Long,
      length: Int): DataFrame = {
    require(length >= 1, s"length must be >= 1, got $length")
    val adj = edges.where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("src")))
      .persist()
    // one row per source: lets the state compute its pick BEFORE the
    // adjacency join, so that join is a true equi-join on (src, rn) —
    // one matched row per walk — instead of an src-only join that
    // fans out over deg(v) neighbors and filters (a celebrity vertex
    // would otherwise cost its whole degree per resident walk)
    val degs = adj.select(col("src").as("dv"), col("deg")).distinct()
    var state = adj.select(col("src").as("start")).distinct()
      .select(col("start"), lit(0L).as("step"), col("start").as("v"))
    val levels = scala.collection.mutable.Buffer(state)
    for (k <- 0 until length) {
      val picked = state
        .join(degs, col("v") === col("dv"))
        .select(col("start"), col("v"),
          (Hashing.hash60(concat_ws("|",
            lit(seed), col("start"), lit(k), col("v"))) % col("deg")).as("pick"))
      state = picked
        .join(adj, adj("src") === picked("v") && adj("rn") === picked("pick"))
        .select(col("start"), lit((k + 1).toLong).as("step"), col("dst").as("v"))
      levels += state
    }
    // length is a small constant, so the unioned plan is shallow; the
    // checkpoint lets the cached adjacency release before returning
    val out = levels.reduce(_ union _).localCheckpoint(false)
    out.count()
    adj.unpersist(false)
    out
  }

  /** Unrolled DuckDB oracle: identical ranked adjacency, identical
    * hash-keyed next-hop joins. */
  def oracleSql(edgesCte: String, seed: Long, length: Int): String = {
    val steps = (0 until length).map { k =>
      val h = Hashing.hash60Sql(s"concat_ws('|', '$seed', w.start, $k, w.v)")
      s"""w${k + 1} AS MATERIALIZED (
         |  SELECT w.start, CAST(${k + 1} AS BIGINT) AS step, a.dst AS v
         |  FROM w$k w JOIN adj a ON a.src = w.v AND a.rn = $h % a.deg)""".stripMargin
    }.mkString(",\n")
    val union = (0 to length).map(k => s"SELECT * FROM w$k").mkString(" UNION ALL ")
    s"""WITH edges AS ($edgesCte),
       |adj AS MATERIALIZED (
       |  SELECT src, dst,
       |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn,
       |    count(*) OVER (PARTITION BY src) AS deg
       |  FROM edges WHERE src <> dst),
       |w0 AS (SELECT start, CAST(0 AS BIGINT) AS step, start AS v FROM
       |  (SELECT DISTINCT src AS start FROM edges WHERE src <> dst)),
       |$steps
       |$union""".stripMargin
  }
}
