package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank with the reference's exact numeric semantics
  * (`/root/reference/mr-pr-cpp.cpp:110-180`, identical in the mpi and
  * mpi-base variants — SURVEY.md §2.4):
  *
  *  - init rank vector `(1, 0, …, 0)` — NOT uniform (`mr-pr-cpp.cpp:125-128`)
  *  - dense page universe `0..websize-1`; ids never mentioned in the edge
  *    list are dangling pages (`mr-pr-cpp.cpp:203-210`)
  *  - each iteration: `sum_pr`/`dangling_pr` from the PRE-normalized
  *    vector (`mr-pr-cpp.cpp:131-138`); from iteration 1 on normalize
  *    `old_pr = pr/sum_pr` (`:140-147`); update
  *    `pr[i] = α·Σ_{j→i} old_pr[j]/outdeg(j) + α·dangling_pr/n + (1−α)/n`
  *    (`:149-173`); L1 convergence `Σ|pr−old_pr| ≤ tol` (`:161-174`)
  *  - constants α=0.85, tol=1e-5, maxIter=10000 (`mr-pr-cpp.cpp:11-13`)
  *
  * Spark-first design (NOT a translation of the reference's machinery):
  * the rank vector is a DataFrame `(id, pr)`; the per-iteration state
  * carries `(id, outdeg, pr, old_pr)` so that sum/dangling/diff reduce to
  * ONE fused aggregate action per iteration (the reference runs three
  * separate driver loops). The edge list is hash-partitioned on `src`
  * once and cached — across iterations only the small rank frame
  * shuffles, the (potentially 100 TB) edge table never re-shuffles.
  * Lineage is truncated with `localCheckpoint` every `checkpointEvery`
  * iterations; on a real cluster swap for `checkpoint` on HDFS.
  */
object PageRank {

  /** Vertex-id frame with a DATA-derived slice count (~4M ids/slice,
    * one slice minimum) instead of spark.range's default parallelism
    * (= core count) slices: the |V|-row state frame inherits this width
    * through every iteration's narrow joins, so per-iteration jobs stop
    * paying core-count-wide task scheduling on small graphs (the gate
    * query ran 32 tasks per scalar aggregate over 401 rows) while a
    * 10^10-vertex graph still gets thousands of slices — width tracks
    * the data, not the core count (guide SS2: scale-adaptive
    * partitioning).
    */
  private def vertRange(spark: SparkSession, n: Long) =
    spark.range(0L, n, 1L, math.max(1L, (n - 1) / 4000000L + 1L).min(262144L).toInt)
      .toDF("id")


  val DefaultAlpha = 0.85
  val DefaultTol = 1e-5
  val DefaultMaxIter = 10000

  /** Run to convergence. Returns `(id BIGINT, rank DOUBLE)` for the dense
    * universe, ascending ids not guaranteed — order downstream if needed.
    *
    * @param websize optional page-universe size; derived as max(id)+1
    *                when absent (the reference's rule).
    */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      websize: Option[Long] = None,
      alpha: Double = DefaultAlpha,
      tol: Double = DefaultTol,
      maxIter: Int = DefaultMaxIter,
      checkpointEvery: Int = 10): DataFrame = {
    val (ranks, _) = runWithStats(spark, edges, websize, alpha, tol, maxIter, checkpointEvery)
    ranks
  }

  /** As [[run]] but also returns the iteration count (for tests/bench). */
  def runWithStats(
      spark: SparkSession,
      edges: DataFrame,
      websize: Option[Long],
      alpha: Double,
      tol: Double,
      maxIter: Int,
      checkpointEvery: Int): (DataFrame, Int) = {

    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val n: Long = websize.getOrElse {
      val row = e.agg(greatest(max("src"), max("dst"))).head()
      if (row.isNullAt(0)) 1L else row.getLong(0) + 1L
    }

    // Static per-vertex frame: (id, outdeg); outdeg null => dangling.
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val verts = vertRange(spark, n)
      .join(outdeg, Seq("id"), "left")
      .persist(StorageLevel.MEMORY_AND_DISK)
    verts.count() // materialize once

    val oneIv = (1.0 - alpha) / n // (1-α)·sum_pr/n with sum_pr≡1 after normalize

    // state: (id, outdeg, pr, old_pr). old_pr only meaningful after an update.
    var state = verts
      .withColumn("pr", when(col("id") === 0, 1.0).otherwise(0.0))
      .withColumn("old_pr", lit(0.0))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var iter = 0
    var diff = Double.MaxValue
    // previous round's state, released only after the aggregate below has
    // materialized the current (lazily checkpointed) state — unpersisting
    // a localCheckpoint before its successor materializes would destroy
    // the only copy of the recomputation source.
    var toRelease: DataFrame = null
    while (diff > tol && iter < maxIter) {
      // ONE action per iteration: Σpr and Σ dangling pr of the current
      // (pre-normalized) vector, plus (from iteration 1) the L1 diff of
      // the previous update, fused into a single aggregate
      // (mr-pr-cpp.cpp:131-138,161-174). This same aggregate also
      // materializes the previous round's lazy localCheckpoint — the
      // checkpoint-then-aggregate pair costs one job, not two.
      val row = state.agg(
        sum("pr"),
        sum(when(col("outdeg").isNull, col("pr")).otherwise(0.0)),
        sum(abs(col("pr") - col("old_pr")))).head()
      if (toRelease != null) {
        toRelease.unpersist(false) // covers the CacheManager-persisted initial state
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
        toRelease = null
      }
      val sumPr = row.getDouble(0)
      val danglingPr = row.getDouble(1)
      if (iter > 0) {
        diff = row.getDouble(2)
        // The reference re-checks the guard at loop top AFTER the update
        // that produced this diff; stopping here performs the same number
        // of updates (mr-pr-cpp.cpp:130,161-178).
        if (diff <= tol) return (finish(state), iter)
      }

      val normalized =
        if (iter == 0) state.withColumn("old_pr", col("pr"))
        else state.withColumn("old_pr", col("pr") / sumPr)

      // α·Σ_{j→i} old_pr[j]/outdeg(j): edge-side stays partitioned on src;
      // only the small rank frame shuffles to meet it, then one exchange
      // on dst for the sum. Map-side partial aggregation applies.
      val contrib = e
        .join(normalized.select(col("id"), (col("old_pr") / col("outdeg")).as("c")),
          e("src") === col("id"))
        .groupBy(e("dst").as("id"))
        .agg(sum("c").as("h"))

      val oneAv = alpha * danglingPr / n
      val next = normalized.drop("pr")
        .join(contrib, Seq("id"), "left")
        .withColumn("pr", coalesce(col("h"), lit(0.0)) * alpha + lit(oneAv + oneIv))
        .drop("h")
        .select("id", "outdeg", "pr", "old_pr")

      // localCheckpoint EVERY iteration: `normalized` appears twice
      // in `next`'s plan (contrib + base), so without truncation the
      // logical plan doubles per iteration — caching alone does not stop
      // Catalyst re-analyzing an exponentially growing tree. Lazy: the
      // next loop-top aggregate (or the caller's first action) scans all
      // partitions and materializes it. On a real cluster swap for
      // reliable `checkpoint` at `checkpointEvery`.
      val cp = next.localCheckpoint(false)
      toRelease = state
      state = cp
      iter += 1
    }
    (finish(state), iter)
  }

  private def finish(state: DataFrame): DataFrame =
    state.select(col("id"), col("pr").as("rank"))

  /** Fixed-iteration variant (no convergence test) — used by the
    * SQL-oracle-checked query entry, where the oracle unrolls the same
    * number of iterations. */
  /** @param init optional WARM-START rank vector (id, rank) — the
    *   incremental-refresh shape: after a graph change, continue from
    *   the previous fixpoint instead of re-converging from the unit
    *   impulse. A warm start normalizes on its FIRST iteration too
    *   (the carried vector is not exactly unit mass), which the
    *   unrolled warm oracle replays. */
  def runFixed(
      spark: SparkSession,
      edges: DataFrame,
      websize: Long,
      iterations: Int,
      alpha: Double = DefaultAlpha,
      init: Option[DataFrame] = None): DataFrame = {
    // persisted: every iteration's contrib join re-reads the edge frame,
    // and without the persist each of those is a full source re-scan
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val verts = vertRange(spark, websize).join(broadcast(outdeg), Seq("id"), "left")
    val n = websize
    val oneIv = (1.0 - alpha) / n

    var state = (init match {
      case None =>
        verts.withColumn("pr", when(col("id") === 0, 1.0).otherwise(0.0))
      case Some(r0) =>
        verts.join(r0.select(col("id"), col("rank").as("pr")), Seq("id"), "left")
          .withColumn("pr", coalesce(col("pr"), lit(0.0)))
    }).localCheckpoint(true)
    var iter = 0
    var toRelease: DataFrame = null
    while (iter < iterations) {
      // ONE job per iteration (the run() pattern, r13): the scalar
      // sum_pr/dangling_pr aggregate ALSO materializes the previous
      // round's lazy checkpoint — versus the former broadcast-stats +
      // eager-checkpoint shape, which paid a broadcast-build job AND a
      // materialization job every iteration (measured: 33 jobs → 14
      // for the 3-iteration gate query).
      val row = state.agg(
        sum("pr"),
        sum(when(col("outdeg").isNull, col("pr")).otherwise(0.0))).head()
      if (toRelease != null) {
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
        toRelease = null
      }
      val sumPr = row.getDouble(0)
      val danglingPr = row.getDouble(1)
      val normalized =
        if (iter == 0 && init.isEmpty) state.withColumn("old_pr", col("pr"))
        else state.withColumn("old_pr", col("pr") / lit(sumPr))
      val contrib = e
        .join(normalized.select(col("id"), (col("old_pr") / col("outdeg")).as("c")),
          e("src") === col("id"))
        .groupBy(e("dst").as("id"))
        .agg(sum("c").as("h"))
      // alpha·dangling/n + (1−α)/n folded driver-side: the identical
      // double ops in the identical order as the former per-row columns,
      // so ranks stay bit-exact vs the unrolled oracle
      val oneAv = alpha * danglingPr / n.toDouble
      val next = normalized.select("id", "outdeg")
        .join(contrib, Seq("id"), "left")
        .withColumn("pr", coalesce(col("h"), lit(0.0)) * alpha + lit(oneAv + oneIv))
        .select("id", "outdeg", "pr")
      // lazy checkpoint: next iteration's aggregate materializes it. The
      // LAST round stays eager so every predecessor (and the cached edge
      // frame) can be released before returning.
      if (iter < iterations - 1) {
        val cp = next.localCheckpoint(false)
        toRelease = state
        state = cp
      } else {
        val cp = next.localCheckpoint(true)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(state)
        state = cp
      }
      iter += 1
    }
    if (toRelease != null)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
    e.unpersist(false)
    state.select(col("id"), col("pr").as("rank"))
  }

  /** WEIGHTED fixed-iteration PageRank — the variant the reference's
    * `add_weight` primitive (`oink/add_weight.cpp`) exists to feed but
    * its own pagerank never consumes: rank flows along each edge in
    * proportion to the edge weight,
    * pr[i] = α·Σ_{j→i} old_pr[j]·w(j,i)/wout(j) + α·dangling/n + (1−α)/n,
    * wout(j) = Σ out-weights of j; dangling = no out-edges (weights are
    * ≥ 1, so the dangling set matches the unweighted one). Per-edge
    * contribution is written `(old_pr · w) / wout` in EXACTLY that
    * order here and in the unrolled oracle. Same single-job-per-
    * iteration shape, pre-normalization discipline, and edge-frame
    * reuse as [[runFixed]].
    * @param edges (src, dst, w) — weights are carried as doubles (the
    *   `read_edge_weight` CLI format); INTEGER-valued weights keep wout
    *   exact (integer sums are exact in IEEE below 2^53,
    *   order-independent), which is what the hash gate relies on */
  def runFixedWeighted(
      spark: SparkSession,
      edges: DataFrame,
      websize: Long,
      iterations: Int,
      alpha: Double = DefaultAlpha,
      init: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
        col("w").cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wout = e.groupBy(col("src").as("id")).agg(sum("w").as("wout"))
    val verts = vertRange(spark, websize)
      .join(broadcast(wout), Seq("id"), "left")
    val n = websize
    val oneIv = (1.0 - alpha) / n

    // init: optional WARM-START vector (id, rank) — runFixed's
    // incremental-refresh shape on the weighted surface: continue from
    // a previous fixpoint after a graph change, re-deriving wout (and
    // the dangling set) from the new edge set. A warm start normalizes
    // on its FIRST iteration too (the carried vector is not exactly
    // unit mass), which the unrolled warm oracle replays.
    var state = (init match {
      case None =>
        verts.withColumn("pr", when(col("id") === 0, 1.0).otherwise(0.0))
      case Some(r0) =>
        verts.join(r0.select(col("id"), col("rank").as("pr")), Seq("id"), "left")
          .withColumn("pr", coalesce(col("pr"), lit(0.0)))
    }).localCheckpoint(true)
    var iter = 0
    var toRelease: DataFrame = null
    while (iter < iterations) {
      // one fused scalar aggregate per iteration — see runFixed (r13)
      val row = state.agg(
        sum("pr"),
        sum(when(col("wout").isNull, col("pr")).otherwise(0.0))).head()
      if (toRelease != null) {
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
        toRelease = null
      }
      val sumPr = row.getDouble(0)
      val danglingPr = row.getDouble(1)
      val normalized =
        if (iter == 0 && init.isEmpty) state.withColumn("old_pr", col("pr"))
        else state.withColumn("old_pr", col("pr") / lit(sumPr))
      val contrib = e
        .join(normalized.select(col("id"), col("old_pr"), col("wout")),
          e("src") === col("id"))
        .groupBy(e("dst").as("id"))
        .agg(sum((col("old_pr") * col("w")) / col("wout")).as("h"))
      val oneAv = alpha * danglingPr / n.toDouble
      val next = normalized.select("id", "wout")
        .join(contrib, Seq("id"), "left")
        .withColumn("pr", coalesce(col("h"), lit(0.0)) * alpha + lit(oneAv + oneIv))
        .select("id", "wout", "pr")
      if (iter < iterations - 1) {
        val cp = next.localCheckpoint(false)
        toRelease = state
        state = cp
      } else {
        val cp = next.localCheckpoint(true)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(state)
        state = cp
      }
      iter += 1
    }
    if (toRelease != null)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
    e.unpersist(false)
    state.select(col("id"), col("pr").as("rank"))
  }

  /** Personalized PageRank (Jeh & Widom, "Scaling personalized web
    * search", WWW 2003): the [[runFixed]] recurrence with the restart
    * mass directed at a seed set instead of spread uniformly —
    * pr[i] = α·Σ_{j→i} old_pr[j]/outdeg(j) + (α·dangling + (1−α))·p(i),
    * p = 1/|S| on the seeds, 0 elsewhere, init pr = p. The similarity
    * ranking "near these pages" that powers related-page and
    * seed-expansion queries. Same single-job-per-iteration shape and
    * pre-normalization discipline as [[runFixed]], so the unrolled SQL
    * oracle is bit-identical. */
  def runPersonalized(
      spark: SparkSession,
      edges: DataFrame,
      websize: Long,
      seeds: Seq[Long],
      iterations: Int,
      alpha: Double = DefaultAlpha,
      init: Option[DataFrame] = None): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs at least one seed")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val verts = vertRange(spark, websize).join(broadcast(outdeg), Seq("id"), "left")
    // IEEE division, replayed identically in the oracle
    val pSeed = 1.0 / seeds.size
    val restart = when(col("id").isin(seeds: _*), pSeed).otherwise(0.0)

    // init: optional WARM-START vector (id, rank) — [[runFixed]]'s
    // incremental-refresh shape with the restart mass still directed
    // at the seeds: after a graph change, continue from the previous
    // personalized fixpoint over the new edge set (outdegrees and the
    // dangling set re-derive). A warm start normalizes on its FIRST
    // iteration too; the unrolled warm oracle replays it.
    var state = (init match {
      case None => verts.withColumn("pr", restart)
      case Some(r0) =>
        verts.join(r0.select(col("id"), col("rank").as("pr")), Seq("id"), "left")
          .withColumn("pr", coalesce(col("pr"), lit(0.0)))
    }).localCheckpoint(true)
    var iter = 0
    var toRelease: DataFrame = null
    while (iter < iterations) {
      // one fused scalar aggregate per iteration — see runFixed (r13)
      val row = state.agg(
        sum("pr"),
        sum(when(col("outdeg").isNull, col("pr")).otherwise(0.0))).head()
      if (toRelease != null) {
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
        toRelease = null
      }
      val sumPr = row.getDouble(0)
      val danglingPr = row.getDouble(1)
      val normalized =
        if (iter == 0 && init.isEmpty) state.withColumn("old_pr", col("pr"))
        else state.withColumn("old_pr", col("pr") / lit(sumPr))
      val contrib = e
        .join(normalized.select(col("id"), (col("old_pr") / col("outdeg")).as("c")),
          e("src") === col("id"))
        .groupBy(e("dst").as("id"))
        .agg(sum("c").as("h"))
      // α·dangling + (1−α) folded driver-side (identical op order)
      val restartMass = alpha * danglingPr + (1.0 - alpha)
      val next = normalized.select("id", "outdeg")
        .join(contrib, Seq("id"), "left")
        .withColumn("pr", coalesce(col("h"), lit(0.0)) * alpha +
          lit(restartMass) * restart)
        .select("id", "outdeg", "pr")
      if (iter < iterations - 1) {
        val cp = next.localCheckpoint(false)
        toRelease = state
        state = cp
      } else {
        val cp = next.localCheckpoint(true)
        org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(state)
        state = cp
      }
      iter += 1
    }
    if (toRelease != null)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(toRelease)
    e.unpersist(false)
    state.select(col("id"), col("pr").as("rank"))
  }
}
