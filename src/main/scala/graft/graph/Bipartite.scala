package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Per-component bipartiteness / odd-cycle detection over the simple
  * undirected graph (self-loops dropped by the [[GraphOps.edgeUpper]]
  * canonicalization, like `cc_find`): BFS-layer every component from
  * its [[ConnectedComponents]] root, then an edge whose endpoints share
  * layer PARITY witnesses an odd cycle — the textbook 2-coloring test,
  * run for ALL components in ONE joint BFS (components are disjoint, so
  * the frontier needs no per-root keying; dist is the unique shortest
  * distance from the component's root, making the odd-edge count
  * deterministic and oracle-replayable).
  *
  * Shape: reuses the O(log n) CC labels; the BFS is one join + distinct
  * + anti-join per LEVEL (diameter-bounded), the parity check one
  * two-sided join + aggregation. The community-structure diagnostic a
  * crawl/citation pipeline asks after components: "is this component
  * two-sided (users/items, authors/papers) or does it fold back on
  * itself?"
  */
object Bipartite {

  /** @param cc (v, comp) labels from [[ConnectedComponents.run]] —
    *           comp MUST be the component minimum (its default)
    * @return (comp BIGINT, size BIGINT, odd_edges BIGINT,
    *         bipartite BOOLEAN) per component. */
  /** Adaptive tail cutover (r14, the engine's bounded-tail
    * discipline): once the UNVISITED set fits one task, a sequential
    * multi-source BFS finishes the layering. `dist` is the unique
    * shortest distance from the component root — a pure function of the
    * graph — so the tail's rows are identical to the distributed
    * levels' by definition; BipartiteSpec pins both regimes. At
    * cutover every edge from a vertex visited before the current
    * frontier into an unvisited vertex is impossible (its endpoint
    * would already be visited), so the frontier rows plus the
    * unvisited-endpoint edges are a complete, bounded task input. */
  val DefaultTailThreshold = 1024

  def run(spark: SparkSession, edges: DataFrame, cc: DataFrame,
      maxIter: Int = 200, tailThreshold: Int = DefaultTailThreshold): DataFrame = {
    val eu = GraphOps.edgeUpper(edges).persist()
    val und = eu.union(eu.select(col("vj").as("vi"), col("vi").as("vj")))

    // the labels are consumed by several actions (count, roots, the
    // tail's anti-join); CC.run returns a live plan whose every action
    // re-derives the vertex set, so pin it once (lazy — the count below
    // materializes it)
    val ccl = Bridge.lazyCheckpoint(cc.select(col("v"), col("comp")))
    val nVerts = ccl.count()
    var vis = ccl.where(col("v") === col("comp"))
      .select(col("v"), col("comp"), lit(0L).as("dist"))
      .localCheckpoint(false)
    var frontier = vis
    var visN = vis.count()
    var n = visN
    var depth = 0L
    while (n > 0 && nVerts - visN > tailThreshold.toLong && depth < maxIter) {
      depth += 1
      val grown = frontier.join(und, frontier("v") === und("vi"))
        .select(col("vj").as("v"), col("comp"))
        // a vertex can arrive via several frontier edges — one row, its
        // single component label rides along
        .dropDuplicates("v")
        .withColumn("dist", lit(depth))
        .join(vis.select(col("v").as("xv")), col("v") === col("xv"), "left_anti")
        .localCheckpoint(false)
      // ONE action per level (r14): the union count materializes `grown`
      // (its source) and grown is disjoint from vis by the anti-join, so
      // the frontier size is the count delta — one job per level, not
      // two (the StronglyConnectedComponents sweep discipline).
      val newVis = vis.union(grown).localCheckpoint(false)
      val newN = newVis.count()
      n = newN - visN
      if (n > 0) {
        if (frontier ne vis) Bridge.releaseCheckpoint(frontier)
        Bridge.releaseCheckpoint(vis)
        vis = newVis
        frontier = grown
        visN = newN
      } else {
        Bridge.releaseCheckpoint(grown)
        Bridge.releaseCheckpoint(newVis)
      }
    }
    if (n > 0 && nVerts - visN > tailThreshold.toLong) {
      if (frontier ne vis) Bridge.releaseCheckpoint(frontier)
      Bridge.releaseCheckpoint(vis)
      eu.unpersist(false)
      throw new IllegalStateException(s"BFS did not drain in $maxIter levels")
    }
    if (n > 0 && nVerts - visN > 0) {
      // Bounded sequential tail: multi-source BFS from the (single-
      // level) frontier over the <= tailThreshold unvisited vertices.
      val unvisited = ccl
        .join(vis.select(col("v").as("xv")), col("v") === col("xv"), "left_anti")
        .select(col("v"), col("comp"))
      val tailEdges = und
        .join(unvisited.select(col("v").as("uv")), col("vj") === col("uv"),
          "left_semi")
      val rows = frontier
          .select(col("v").as("a"), col("dist").as("b"), lit(0).as("kind"))
        .unionAll(unvisited
          .select(col("v").as("a"), col("comp").as("b"), lit(1).as("kind")))
        .unionAll(tailEdges
          .select(col("vi").as("a"), col("vj").as("b"), lit(2).as("kind")))
      import spark.implicits._
      val tail = rows.as[(Long, Long, Int)]
        .coalesce(1)
        .mapPartitions { it =>
          val front = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val comp = new scala.collection.mutable.HashMap[Long, Long]
          val adj = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]
          it.foreach {
            case (v, d, 0) => front += ((v, d))
            case (v, c, 1) => comp(v) = c
            case (a, b, _) =>
              adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
          }
          val dist = new scala.collection.mutable.HashMap[Long, Long]
          var queue = front
          while (queue.nonEmpty) {
            val nextQ = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
            queue.foreach { case (v, d) =>
              adj.getOrElse(v, scala.collection.mutable.ArrayBuffer.empty)
                .foreach { u =>
                  if (comp.contains(u) && !dist.contains(u)) {
                    dist(u) = d + 1L
                    nextQ += ((u, d + 1L))
                  }
                }
            }
            queue = nextQ
          }
          dist.iterator.map { case (v, d) => (v, comp(v), d) }
        }
        .toDF("v", "comp", "dist")
        .localCheckpoint(true)
      val merged = vis.unionAll(tail).localCheckpoint(true)
      Bridge.releaseCheckpoint(vis)
      if (frontier ne vis) Bridge.releaseCheckpoint(frontier)
      vis = merged
      frontier = vis
    }
    if (frontier ne vis) Bridge.releaseCheckpoint(frontier)

    val side = vis.select(col("v"), col("comp"), pmod(col("dist"), lit(2L)).as("par"))
    val odd = eu
      .join(side.select(col("v").as("av"), col("par").as("pa")), col("vi") === col("av"))
      .join(side.select(col("v").as("bv"), col("par").as("pb"), col("comp")),
        col("vj") === col("bv"))
      .where(col("pa") === col("pb"))
      .groupBy("comp").agg(count(lit(1)).as("odd_edges"))
    val out = side.groupBy("comp").agg(count(lit(1)).as("size"))
      .join(odd, Seq("comp"), "left")
      .select(col("comp"), col("size"),
        coalesce(col("odd_edges"), lit(0L)).as("odd_edges"))
      .withColumn("bipartite", col("odd_edges") === 0L)
      .localCheckpoint(false)
    out.count()
    Bridge.releaseCheckpoint(vis)
    Bridge.releaseCheckpoint(ccl)
    eu.unpersist(false)
    out
  }

  /** DuckDB oracle: CC labels via reachability closure, min-dist BFS
    * from each component root via a recursive walk, parity join. The
    * hop guard (60) is far above the test graphs' diameter. */
  def oracleSql(edgesCte: String): String =
    s"""WITH RECURSIVE edges AS ($edgesCte),
       |eu AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS vi, greatest(src,dst) AS vj
       |       FROM edges WHERE src <> dst),
       |und AS MATERIALIZED (SELECT vi, vj FROM eu UNION ALL SELECT vj AS vi, vi AS vj FROM eu),
       |verts AS MATERIALIZED (SELECT DISTINCT v FROM
       |  (SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
       |reach(v, r) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT u.vj, re.r FROM reach re JOIN und u ON u.vi = re.v),
       |cc AS MATERIALIZED (SELECT v, min(r) AS comp FROM reach GROUP BY v),
       |walk(v, comp, d) AS (
       |  SELECT comp, comp, CAST(0 AS BIGINT) FROM (SELECT DISTINCT comp FROM cc)
       |  UNION
       |  SELECT u.vj, w.comp, w.d + 1 FROM walk w JOIN und u ON u.vi = w.v
       |  WHERE w.d < 60),
       |dd AS MATERIALIZED (SELECT v, comp, min(d) % 2 AS par FROM walk GROUP BY v, comp),
       |odd AS (
       |  SELECT a.comp, count(*) AS odd_edges
       |  FROM eu e JOIN dd a ON a.v = e.vi JOIN dd b ON b.v = e.vj
       |  WHERE a.par = b.par GROUP BY a.comp)
       |SELECT c.comp, count(*) AS size,
       |  coalesce(any_value(o.odd_edges), 0) AS odd_edges,
       |  coalesce(any_value(o.odd_edges), 0) = 0 AS bipartite
       |FROM cc c LEFT JOIN odd o ON o.comp = c.comp
       |GROUP BY c.comp""".stripMargin
}
