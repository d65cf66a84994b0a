package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle enumeration — the reference's `tri_find` implements Cohen's
  * MapReduce algorithm (`/root/reference/oink/tri_find.cpp:43-82`):
  * augment edges with degrees, let the LOW-degree endpoint of each edge
  * emit candidate "angles", then semi-join candidates against the edge
  * set (`reduce_emit_triangles`, `tri_find.cpp:280-325`).
  *
  * The low-degree orientation is the load-bearing trick
  * (`tri_find.cpp:184-203`) and is preserved here: every edge is oriented
  * from its lower-(degree, id) endpoint to the higher one, so the
  * self-join fan-out per vertex is bounded by O(sqrt(|E|)) even on
  * power-law graphs — without it a single hub vertex would produce a
  * deg² candidate explosion. Output triangles are emitted id-sorted
  * (a < b < c), so the result set is independent of the orientation.
  */
object Triangles {

  /** @param edges raw directed edge list (dups/self-loops tolerated)
    * @return (a BIGINT, b BIGINT, c BIGINT) with a < b < c, one row per
    *         triangle of the undirected simple graph.
    */
  def run(edges: DataFrame): DataFrame = {
    // lazy localCheckpoints (r13): eu feeds BOTH the orientation join
    // and the closing semi-join, and oriented feeds both wedge sides —
    // without truncation Catalyst re-derives each subtree (scan +
    // distinct exchange) per consumer (the before-plan shows the
    // duplicated subplans); with it each is computed exactly once on
    // the first action.
    val eu = GraphOps.edgeUpper(edges).localCheckpoint(false) // (vi < vj), distinct

    // degree in the simple undirected graph
    val deg = eu.select(explode(array(col("vi"), col("vj"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))

    // orient each edge from lower (deg, id) endpoint -> higher
    val d1 = deg.select(col("v").as("vi"), col("deg").as("di"))
    val d2 = deg.select(col("v").as("vj"), col("deg").as("dj"))
    val oriented = eu.join(d1, "vi").join(d2, "vj")
      .select(
        when(col("di") < col("dj") || (col("di") === col("dj") && col("vi") < col("vj")), col("vi"))
          .otherwise(col("vj")).as("lo"),
        when(col("di") < col("dj") || (col("di") === col("dj") && col("vi") < col("vj")), col("vj"))
          .otherwise(col("vi")).as("hi"))
      .localCheckpoint(false)

    // angles: two oriented edges sharing their low vertex. The probe
    // side is hash-spread on `lo` across the full core count first:
    // wedge generation fans out each probe row by outdeg(lo), which
    // cost-based stats cannot see — without the explicit spread, AQE
    // coalesces the (tiny, ~|E| row) probe input to one or two
    // partitions and the (huge) generated wedge set runs near-serially
    // (measured 2.9x at sf0.1). Hash on the join key, not round-robin:
    // when the edge set outgrows the broadcast threshold and the join
    // becomes sort-merge, hash(lo, np) already satisfies the join's
    // required distribution, so the exchange is reused rather than
    // doubled. Per-key skew of wedge fan-out is bounded by the
    // low-degree orientation (O(sqrt |E|) per vertex).
    val np = edges.sparkSession.sparkContext.defaultParallelism
    val a1 = oriented.repartition(np, col("lo")).select(col("lo").as("p"), col("hi").as("x"))
    val a2 = oriented.select(col("lo").as("p"), col("hi").as("y"))
    val angles = a1.join(a2, "p").where(col("x") < col("y"))

    // close the wedge: (x,y) must be an edge (canonical, x<y already)
    val closed = angles.join(eu,
      angles("x") === eu("vi") && angles("y") === eu("vj"), "left_semi")

    closed.select(
      least(col("p"), col("x")).as("a"),
      when(col("p") < col("x"), col("x")).otherwise(
        when(col("p") < col("y"), col("p")).otherwise(col("y"))).as("b"),
      greatest(col("p"), col("y")).as("c"))
  }

  /** Per-vertex incident triangle count — `neigh_tri`-adjacent stat
    * (`oink/neigh_tri.cpp:39-60`). */
  def perVertexCount(edges: DataFrame): DataFrame =
    run(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("ntri"))

  /** INCREMENTAL triangle-count maintenance — the second member of the
    * incremental-graph family next to
    * [[ConnectedComponents.incremental]]: given the standing count and
    * an edge batch, the delta touches only edges INCIDENT TO BATCH
    * ENDPOINTS (one semi-join prune), never re-enumerating the standing
    * graph's triangles.
    *
    * Inclusion-exclusion (k = new edges in a triangle, k ∈ {1,2,3}):
    * T1 counts each triangle k times (once per new edge), c2 counts it
    * C(k,2) wedge-pair times, T3 once iff k=3 — so Δ = T1 − c2 + T3
    * counts every new triangle exactly once (k=1: 1−0+0; k=2: 2−1+0;
    * k=3: 3−3+1). Batch edges already present in the standing graph are
    * dropped first (they create no triangles), as are duplicates and
    * self-loops (edgeUpper).
    *
    * Two entry points. The MAINTAINED shape takes the standing count as
    * a parameter (a 1-row `tri_standing BIGINT` frame — the number the
    * caller has been carrying since the last batch), so a refresh costs
    * only the delta joins and never re-enumerates the standing graph's
    * triangles — the contract that matters at billion-edge scale. The
    * 2-arg convenience overload BOOTSTRAPS that count with a full
    * [[run]] (one-time cost, or the oracle-checking shape); it is NOT
    * the steady-state refresh path.
    *
    * @return one row (tri_standing, tri_delta, tri_total) */
  def incrementalCount(standingEdges: DataFrame, batchEdges: DataFrame,
      standingCount: DataFrame): DataFrame = {
    val gu = GraphOps.edgeUpper(standingEdges)
    val bu = GraphOps.edgeUpper(batchEdges)
      .join(gu, Seq("vi", "vj"), "left_anti")
    val uu = gu.unionAll(bu) // disjoint by construction

    // union adjacency restricted to batch endpoints (the semi-join prune
    // that makes this incremental: standing edges not incident to the
    // batch are never read past the scan filter)
    val bverts = bu.select(explode(array(col("vi"), col("vj"))).as("v"))
      .distinct()
    val adj = uu.select(col("vi").as("v"), col("vj").as("n"))
      .unionAll(uu.select(col("vj").as("v"), col("vi").as("n")))
      .join(bverts, Seq("v"), "left_semi")

    // T1: for each new edge (vi,vj), neighbors w of vi with (vj,w) ∈ U
    val wedges = bu
      .join(adj.select(col("v").as("vi"), col("n").as("w")), Seq("vi"))
      .where(col("w") =!= col("vj"))
    val t1 = wedges.join(uu.select(
        least(col("vi"), col("vj")).as("cvi"),
        greatest(col("vi"), col("vj")).as("cvj")),
      least(col("vj"), col("w")) === col("cvi") &&
        greatest(col("vj"), col("w")) === col("cvj"), "left_semi")
      .agg(count(lit(1)).as("t1"))

    // c2: wedges of TWO new edges sharing a center, closed by any U edge
    val bd = bu.select(col("vi").as("p"), col("vj").as("x"))
      .unionAll(bu.select(col("vj").as("p"), col("vi").as("x")))
    val c2 = bd.join(bd.select(col("p"), col("x").as("y")), Seq("p"))
      .where(col("x") < col("y"))
      .join(uu, col("x") === col("vi") && col("y") === col("vj"), "left_semi")
      .agg(count(lit(1)).as("c2"))

    // T3: triangles entirely inside the batch (tiny by construction)
    val t3 = run(bu.select(col("vi").as("src"), col("vj").as("dst")))
      .agg(count(lit(1)).as("t3"))
    val standing = standingCount
      .select(standingCount.columns.head)
      .toDF("tri_standing")

    standing.crossJoin(t1).crossJoin(c2).crossJoin(t3)
      .select(col("tri_standing"),
        (col("t1") - col("c2") + col("t3")).as("tri_delta"),
        (col("tri_standing") + col("t1") - col("c2") + col("t3"))
          .as("tri_total"))
  }

  /** Bootstrap overload: computes the standing count with a full
    * [[run]] over `standingEdges`, then delegates. Use once to seed the
    * maintained count (or to oracle-check it); every subsequent refresh
    * should pass the carried count to the 3-arg form. */
  def incrementalCount(standingEdges: DataFrame, batchEdges: DataFrame): DataFrame =
    incrementalCount(standingEdges, batchEdges,
      run(standingEdges).agg(count(lit(1)).as("tri_standing")))
}
