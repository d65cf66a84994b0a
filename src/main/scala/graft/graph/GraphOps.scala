package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** OINK graph primitives re-expressed as declarative Spark plans.
  * Reference semantics per file:line in each Scaladoc; SURVEY.md §2.5-2.6.
  *
  * All operate on a directed edge DataFrame `(src BIGINT, dst BIGINT)`;
  * duplicates/self-loops allowed on input (the reference's raw edge-list
  * contract, FIXTURES.md §1).
  */
object GraphOps {

  /** `degree dupflag=1` (`/root/reference/oink/degree.cpp:36-59`):
    * out-degree per vertex (src endpoint only). */
  def outDegree(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))

  /** `degree dupflag=2`: both endpoints contribute. `explode` keeps this
    * one shuffle (map-side explode, partial count, single exchange). */
  def degreeBoth(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** `degree_stats` (`oink/degree_stats.cpp:35-70`): histogram of degrees,
    * descending — two chained aggregations, both with map-side partials. */
  def degreeStats(edges: DataFrame): DataFrame =
    degreeBoth(edges).groupBy(col("deg")).agg(count(lit(1)).as("nvert"))
      .orderBy(col("deg").desc)

  /** `degree_weight` (`oink/degree_weight.cpp:36-60`): per-edge weight
    * 1/outdeg(src). The degree side is a tiny aggregate of the edge list
    * itself — broadcast it so the big edge table never shuffles. */
  def degreeWeight(edges: DataFrame): DataFrame =
    edges.join(broadcast(outDegree(edges)), col("src") === col("v"))
      .select(col("src"), col("dst"),
        (lit(1.0) / col("deg").cast("double")).as("weight"))

  /** `edge_upper` (`oink/edge_upper.cpp:37-61`, `map_edge_upper.cpp:9-23`):
    * canonicalize to vi<vj, drop self-loops, dedupe. */
  def edgeUpper(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("vi"),
        greatest(col("src"), col("dst")).as("vj"))
      .where(col("vi") =!= col("vj"))
      .distinct()

  /** `vertex_extract` (`oink/vertex_extract.cpp:36-54`): distinct vertices. */
  def vertexExtract(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("v")).distinct()

  /** `neighbor` (`oink/neighbor.cpp:34-52`): adjacency list per src,
    * digested to a canonical sorted comma-joined string so the result is
    * deterministic and oracle-hashable. */
  def neighbors(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("v"))
      .agg(concat_ws(",", sort_array(collect_list(col("dst")))).as("nbrs"))

  /** Undirected expansion used by CC / triangles / MIS: canonical edges
    * in both directions. */
  def undirected(edges: DataFrame): DataFrame = {
    val e = edgeUpper(edges)
    e.union(e.select(col("vj").as("vi"), col("vi").as("vj")))
  }

  /** `neigh_tri` (`oink/neigh_tri.cpp:39-60`): per vertex, its neighbor
    * edges plus the OPPOSITE edge of every triangle containing it —
    * map1 (`neigh_tri.cpp:143-162`) keys each triangle under all three
    * vertices with the facing edge as value; print (`:126-137`) emits
    * `vi vj` for neighbor values and `vj vk` for triangle values. One
    * map-side explode on the (already small) triangle list unioned with
    * a projection of the edge list — no extra shuffle. */
  def neighTri(edges: DataFrame, triangles: DataFrame): DataFrame = {
    val nbrRows = edges.select(
      col("src").as("v"), col("src").as("ea"), col("dst").as("eb"))
    val triRows = triangles.select(explode(array(
        struct(col("a").as("v"), col("b").as("ea"), col("c").as("eb")),
        struct(col("b").as("v"), col("a").as("ea"), col("c").as("eb")),
        struct(col("c").as("v"), col("a").as("ea"), col("b").as("eb")))).as("r"))
      .select("r.v", "r.ea", "r.eb")
    nbrRows.unionByName(triRows)
  }

  /** Local clustering coefficient on the simple undirected graph:
    * lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 where deg < 2. Takes the
    * (possibly memoized) triangle enumeration so the expensive stage is
    * shared; the only float is one division of exact integers, so a SQL
    * oracle reproduces it bit-for-bit. */
  def localClustering(edges: DataFrame, triangles: DataFrame): DataFrame = {
    val deg = undirected(edges).groupBy(col("vi").as("v"))
      .agg(count(lit(1)).as("deg"))
    val tc = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("tv"))
      .groupBy("tv").agg(count(lit(1)).as("ntri"))
    deg.join(tc, deg("v") === tc("tv"), "left")
      .select(deg("v"), col("deg"), coalesce(col("ntri"), lit(0L)).as("ntri"))
      .withColumn("lcc",
        when(col("deg") >= 2,
          (col("ntri") * 2).cast("double") / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)))
  }
}
