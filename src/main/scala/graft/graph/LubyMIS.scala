package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Hashing

/** Maximal independent set — the reference's `luby_find`
  * (`/root/reference/oink/luby_find.cpp:53-91`): Luby's algorithm. Each
  * vertex draws a random priority; a vertex wins a round when its
  * priority beats every ACTIVE neighbor's; winners enter the MIS,
  * winners and their neighbors leave the active set; repeat until no
  * vertex is active.
  *
  * The reference seeds per-vertex RNG as `srand48(v + seed)`
  * (`luby_find.cpp:130-138`) precisely so results are decomposition-
  * independent; we keep that property with the portable
  * `hash60(seed, v)` priority (ties broken by vertex id), making the
  * output fully deterministic for a given seed and independent of
  * partitioning — with fixed priorities the rounds converge to the
  * greedy MIS of the priority order.
  *
  * Scale design: ONE state frame `(v, p, st)` of constant size |V|; each
  * round is two joins against the ACTIVE edge frame and ends in a lazy
  * `localCheckpoint` materialized by the round's count, so plan depth is
  * constant across rounds and each round costs one job. The
  * active edge frame shrinks every round to edges whose BOTH endpoints
  * are still active (a constant fraction of vertices leaves per round,
  * so per-round join work decays geometrically instead of re-scanning
  * the full edge list O(log n) times — the frame a 100 TB graph needs).
  * Edges touching inactive vertices are irrelevant to both the
  * neighbor-best and loser-neighbor joins, so the shrink is semantics-
  * preserving. Rounds are O(log n) w.h.p.
  */
object LubyMIS {

  private val Active = "A"
  private val InMis = "I"
  private val Out = "O"

  /** Adaptive tail cutover (r14, the [[Coloring]] discipline): once the
    * ACTIVE set fits one bounded task, finish with the SEQUENTIAL greedy
    * MIS pass the Luby fixpoint provably equals — with fixed priorities
    * the rounds peel exactly the greedy MIS of ascending (p, v) (the
    * scaladoc invariant above), and Luby's tail admits O(1) winners per
    * round on dense graphs, each paying full distributed-round freight
    * (the r13 gate graph: ~10 s of rounds over ≤401 vertices). The tail
    * is self-contained: an ACTIVE vertex never has an InMis neighbor
    * (it would be Out), and `activeEdges` is already shrunk to
    * active–active pairs, so the greedy pass over the bounded active
    * subgraph is independent of every decided vertex. Bit-identical
    * output in both regimes is pinned by LubyMISSpec. */
  val DefaultTailThreshold = 1024

  /** @return single-column (v BIGINT): the MIS, deterministic per seed. */
  def run(spark: SparkSession, edges: DataFrame, seed: Long, maxIter: Int = 100,
      tailThreshold: Int = DefaultTailThreshold): DataFrame =
    runCounted(spark, edges, seed, maxIter, tailThreshold)._1

  /** Like [[run]] but also reports the round count — the O(log n)
    * w.h.p. bound is asserted in LubyMISSpec on a long chain (with
    * `tailThreshold = 0`, the pure distributed regime). */
  def runCounted(spark: SparkSession, edges: DataFrame, seed: Long, maxIter: Int = 100,
      tailThreshold: Int = DefaultTailThreshold): (DataFrame, Int) = {
    // All checkpoints here are LAZY (see ConnectedComponents.runCounted):
    // the plan truncates to a LogicalRDD leaf immediately, and the blocks
    // materialize inside the round's own count action — one job per round
    // instead of three (state checkpoint + count + edge-shrink
    // checkpoint). Nothing is unpersisted mid-loop, so a lazy frame's
    // recomputation sources always survive until it materializes.
    var activeEdges = GraphOps.undirected(edges)
      .repartition(col("vi"))
      .localCheckpoint(false)

    var state = GraphOps.vertexExtract(edges)
      .select(col("v"), Hashing.hash60(seed, col("v")).as("p"), lit(Active).as("st"))
      .localCheckpoint(false)

    var iter = 0
    var remaining = state.where(col("st") === Active).count()
    while (remaining > tailThreshold.toLong && iter < maxIter) {
      val act = state.where(col("st") === Active)
      // best (priority, id) among ACTIVE neighbors of each vertex
      val pj = act.select(col("v").as("vj"), col("p").as("pj"))
      val nbrBest = activeEdges.join(pj, "vj")
        .groupBy(col("vi").as("v"))
        .agg(min(struct(col("pj"), col("vj"))).as("best"))
      val winners = act.join(nbrBest, Seq("v"), "left")
        .where(col("best").isNull || struct(col("p"), col("v")) < col("best"))
        .select("v")
      val loserNbrs = activeEdges
        .join(winners.withColumnRenamed("v", "vi"), Seq("vi"), "left_semi")
        .select(col("vj").as("v")).distinct()

      state = state
        .join(winners.withColumn("w", lit(true)), Seq("v"), "left")
        .join(loserNbrs.withColumn("l", lit(true)), Seq("v"), "left")
        .select(col("v"), col("p"),
          when(col("st") =!= Active, col("st"))
            .when(col("w"), InMis)
            .when(col("l"), Out)
            .otherwise(Active).as("st"))
        .localCheckpoint(false) // constant plan depth; materialized by the count below
      remaining = state.where(col("st") === Active).count()
      // shrink to edges between still-active endpoints — winners and
      // their neighborhoods (a constant fraction per round) drop out
      if (remaining > 0) {
        val still = state.where(col("st") === Active).select("v")
        activeEdges = activeEdges
          .join(still.withColumnRenamed("v", "vi"), Seq("vi"), "left_semi")
          .join(still.withColumnRenamed("v", "vj"), Seq("vj"), "left_semi")
          .select("vi", "vj")
          .localCheckpoint(false) // materialized by next round's joins
      }
      iter += 1
    }
    val decided = state.where(col("st") === InMis).select("v")
    // maxIter exit with an oversize active set: legacy behavior (the
    // accumulated MIS) — the tail task must stay bounded by the threshold
    if (remaining == 0L || remaining > tailThreshold.toLong)
      return (decided, iter)
    // Bounded sequential tail: ≤ tailThreshold vertices still active.
    // Gather each active vertex's ACTIVE-neighbor list (activeEdges is
    // exactly the active–active pair set at this point — initially all
    // vertices are active, and every completed round re-shrinks it),
    // then ONE task replays the greedy MIS in ascending (p, v): a vertex
    // joins iff no already-joined neighbor — the exact recurrence the
    // Luby fixpoint satisfies for fixed priorities, so the union with
    // the already-decided InMis set is the unchanged result.
    val act = state.where(col("st") === Active).select(col("v"), col("p"))
    val adj = activeEdges
      .groupBy(col("vi").as("v")).agg(collect_set(col("vj")).as("nbrs"))
    val rows = act.join(adj, Seq("v"), "left")
      .select(col("v"), col("p"),
        coalesce(col("nbrs"), array().cast("array<bigint>")).as("nbrs"))
    import spark.implicits._
    val tail = rows.as[(Long, Long, Seq[Long])]
      .coalesce(1)
      .mapPartitions { it =>
        val vs = it.toArray.sortBy(t => (t._2, t._1)) // ascending (p, v)
        val inMis = scala.collection.mutable.HashSet.empty[Long]
        vs.iterator.flatMap { case (v, _, nbrs) =>
          if (nbrs.exists(inMis.contains)) Iterator.empty
          else { inMis += v; Iterator.single(v) }
        }
      }
      .toDF("v")
    (decided.unionAll(tail), iter)
  }
}
