package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components — the reference's `cc_find` zone-propagation
  * (`/root/reference/oink/cc_find.cpp:38-109`: iteratively assign every
  * vertex the minimum "zone" id among itself and its neighbors until no
  * zone changes). The reference's big-zone random-scatter splitting
  * (`cc_find.cpp:202-300`) is an artifact of MR-MPI reducer skew; in
  * Spark the same skew is handled by AQE skew-join splitting, so the
  * algorithm reduces to plain min-label propagation (SURVEY.md §7.3).
  *
  * Scale notes: each round is one join + one aggregation, both keyed on
  * vertex id, so successive rounds reuse the same hash partitioning.
  * Rounds = graph diameter; for 100 TB graphs with large diameter,
  * switch to the large-star/small-star variant (same primitive per
  * round, O(log n) rounds) — the round body below is deliberately
  * factored so only the neighbor-min expression differs.
  */
object ConnectedComponents {

  /** @param edges directed edge list; components are of the undirected
    *              graph (the reference treats edges as undirected zones).
    * @return (v BIGINT, comp BIGINT) — comp = min vertex id reachable.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 100): DataFrame = {
    val und = GraphOps.undirected(edges)
      .repartition(col("vi"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var comp = GraphOps.vertexExtract(edges)
      .withColumn("comp", col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // min neighbor component per vertex; partial (map-side) min applies.
      val nbrMin = und.join(comp, und("vi") === comp("v"))
        .groupBy(und("vj").as("v"))
        .agg(min("comp").as("nbr_comp"))
      // Eager localCheckpoint every round: `comp` appears twice in the
      // round plan (join + least), so the logical tree would double per
      // round without truncation (see PageRank.run).
      val next = comp.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (col("nbr_comp") < col("comp")).cast("long").as("chg"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(sum("chg"), lit(0L))).head().getLong(0)
      comp.unpersist(false)
      comp = next.drop("chg")
      iter += 1
    }
    und.unpersist(false)
    comp
  }

  /** `cc_stats` (`oink/cc_stats.cpp:37-62`): component-size histogram. */
  def stats(cc: DataFrame): DataFrame =
    cc.groupBy("comp").agg(count(lit(1)).as("size"))
      .groupBy("size").agg(count(lit(1)).as("ncomp"))
      .orderBy(col("size").desc)
}
