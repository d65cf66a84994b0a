package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, HllSketch60, HllUnion}
import graft.graph.NeighborhoodFunction

/** Structured Streaming surface for EDGE streams — the incremental twin
  * of the batch HyperANF machinery ([[graft.graph.NeighborhoodFunction]]).
  *
  * The radius-1 neighborhood ball is a monotone sketch union: as edges
  * (src, dst) arrive, sketch(src) absorbs dst's singleton and every
  * vertex absorbs its own — HLL registers merge by max, so the state is
  * a join-semilattice (a CRDT) and arrival order, duplication, and
  * batching cannot change the result. The state store holds ONE
  * 256-byte register blob per vertex (the roadmap's "register blobs in
  * the state store" shape), constant per vertex no matter how many
  * edges stream through — the bounded-state requirement of a 100 TB/day
  * link stream. No watermark is needed: the aggregation is append-only
  * per key and never closes.
  *
  * Higher radii need a join against the previous round's sketches —
  * that is the batch [[NeighborhoodFunction.run]] recurrence, re-run
  * per snapshot; streaming keeps the r=1 frontier fresh between
  * batch recomputations (the standard lambda split).
  */
object GraphStreams {

  /** Streaming source over the testdata orders table, derived to the
    * canonical edge list exactly like [[graft.io.Tables.edges]]. */
  def readEdges(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/orders.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
      .select(
        (col("o_custkey") % graft.io.Tables.GraphN).cast("long").as("src"),
        (col("o_orderkey") % graft.io.Tables.GraphN).cast("long").as("dst"))
  }

  /** Incremental radius-1 ANF ball per vertex over an edge stream:
    * each edge contributes its dst to src's ball and both endpoints to
    * their own (HyperBall's self-inclusive convention, so the result
    * rows equal the batch [[NeighborhoodFunction.run]] r=1 rows
    * bit-for-bit once the stream drains). Run in Update output mode.
    *
    * @return (v BIGINT, sk BINARY, n_est DOUBLE) — the live register
    *         blob and its exact-power estimate. */
  def neighborhoodSketchStream(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("src").cast("long").as("v"), col("src").cast("long").as("u")),
        struct(col("src").cast("long").as("v"), col("dst").cast("long").as("u")),
        struct(col("dst").cast("long").as("v"), col("dst").cast("long").as("u"))))
        .as("r"))
      .select(col("r.v").as("v"),
        Hashing.hash60(NeighborhoodFunction.Seed, col("r.u")).as("h"))
      .groupBy("v")
      .agg(HllUnion.hll60Regs(col("h")).as("sk"),
        HllSketch60.hll60(col("h")).as("n_est"))
}
