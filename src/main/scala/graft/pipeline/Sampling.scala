package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling for training-data curation.
  *
  * Sampling at corpus scale must be reproducible (the same run
  * re-executed after a failure keeps the same rows), partitioning-
  * independent, and join-stable (two tables sampled on a shared key
  * stay aligned). Spark's `df.sample` is none of these across retries
  * and repartitions, so these operators derive the keep decision from
  * the portable [[Hashing.rand01]] of a caller-chosen key — which also
  * makes them DuckDB-oracle-verifiable. No shuffle: sampling is a
  * pushdown-friendly filter on a scan.
  */
object Sampling {

  /** Keep a row iff the key's seeded uniform draw falls below `rate`. */
  def uniform(df: DataFrame, key: Column, rate: Double, seed: Long): DataFrame =
    df.where(Hashing.rand01(seed, key) < rate)

  /** Deterministic train/val/test assignment by key hash: stable across
    * runs, machines, and corpus growth (a doc's split never changes when
    * other docs arrive — the property random split lacks), leak-free by
    * construction (one key → one split), and a pure projection: no
    * shuffle, no RNG state. Percentages are integer buckets of the
    * key-hash mod 100. */
  def deterministicSplit(df: DataFrame, key: Column,
      trainPct: Int = 98, valPct: Int = 1, seed: Long = 77L): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "deterministicSplit: need train > 0, val >= 0, train + val < 100")
    df.withColumn("bucket", Hashing.hash60(seed, key.cast("string")) % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Per-stratum rates (e.g. downsample boilerplate languages, keep all
    * rare ones). `rates` maps stratum value → keep rate; `default`
    * applies to unlisted strata. The rate lookup folds into a CASE
    * expression — codegen'd, no join, no UDF. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      rates: Map[String, Double], default: Double, seed: Long): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.where(Hashing.rand01(seed, key) < rate)
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): score
    * every document by how much its hashed-bigram distribution looks
    * like a TARGET corpus versus the RAW corpus — the log importance
    * ratio Σ k_b·(ln p_target(b) − ln p_raw(b)) over the doc's hashed
    * feature counts, with add-one smoothing over `buckets` hash
    * buckets. High scores mark raw documents worth keeping when
    * curating toward the target distribution; feed the weights to
    * [[weightedSample]] for the paper's resampling step.
    *
    * Scale shape: bigrams hash straight into a bounded bucket space, so
    * both bag models are `buckets`-row aggregates (map-side combined)
    * that BROADCAST back; per-doc scoring is one (doc, bucket) count
    * aggregate and a broadcast join — the raw corpus is never shuffled
    * by anything wider than its own (doc, bucket) pairs.
    *
    * @return (doc_id, n_bigrams, logw) for every document in `raw` —
    *         docs too short for a bigram score 0. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, id: Column,
      text: Column, buckets: Int = 1 << 14): DataFrame = {
    import graft.text.TextAnalysis
    def feats(df: DataFrame): DataFrame = df
      .select(id.as("doc_id"), TextAnalysis.tokens(text).as("toks"))
      // fused native shingle hashing (r13, ShingleHashesExpr)
      .select(col("doc_id"),
        explode(graft.functions.ShingleHashesExpr.shingleHashes(
          col("toks"), 2)).as("h"))
      .select(col("doc_id"), (col("h") % buckets).as("b"))
    val docFeats = feats(raw).groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    val rawCounts = docFeats.groupBy("b").agg(sum("k").as("cr"))
    val tgtCounts = feats(target).groupBy("b").agg(count(lit(1)).as("ct"))
    val totals = rawCounts.agg(sum("cr").as("r_tot"))
      .crossJoin(tgtCounts.agg(sum("ct").as("t_tot")))
    // every doc bucket exists in rawCounts by construction; target
    // counts default to 0 and ride on the +1 smoothing
    val ratio = rawCounts.join(tgtCounts, Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
             (col("t_tot").cast("double") + lit(buckets.toDouble))) -
         log((col("cr").cast("double") + lit(1.0)) /
             (col("r_tot").cast("double") + lit(buckets.toDouble)))).as("lr"))
    val scored = docFeats.join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(sum("k").as("n_bigrams"),
        round(sum(col("k").cast("double") * col("lr")), 6).as("logw"))
    raw.select(id.as("doc_id")).join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_bigrams")).na.fill(0.0, Seq("logw"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): draw `k`
    * rows where selection probability is proportional to `weight`, in
    * one distributed pass. Each row gets the deterministic uniform
    * u = rand01(seed, key) and priority ln(u)/w; the k LARGEST
    * priorities are the sample — the distributed equivalent of the
    * paper's reservoir, with the same marginal distribution.
    *
    * Scale shape: priorities are computed in the scan (no shuffle), and
    * the global top-k runs as TakeOrderedAndProject — per-partition
    * heaps of size k, k rows to the driver — never a full sort. The
    * returned frame excludes the float priority so downstream equality
    * checks (and the oracle) compare exact row sets only.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: Long): DataFrame = {
    val pri = log(Hashing.rand01(seed, key)) / weight.cast("double")
    df.where(weight > 0)
      .withColumn("__pri", pri)
      .orderBy(col("__pri").desc, key.asc)
      .limit(k)
      .drop("__pri")
  }

  /** Per-stratum Efraimidis-Spirakis sample: the top `k` hash
    * priorities WITHIN each stratum, taken through the engine's
    * TopKPerKey physical operator — bounded map-side heaps per
    * (stratum, partition), ≤ k rows per stratum crossing the exchange,
    * never a per-stratum sort. The per-domain quota cousin of
    * [[weightedSample]] (same priority, same determinism contract). */
  def weightedSamplePerKey(df: DataFrame, stratum: Column, key: Column,
      weight: Column, k: Int, seed: Long): DataFrame = {
    val pri = log(Hashing.rand01(seed, key)) / weight.cast("double")
    graft.plans.TopKPerKey.topKPerKey(
        df.where(weight > 0).withColumn("__pri", pri),
        Seq(stratum), Seq(col("__pri").desc, key.asc), k)
      .drop("__pri")
  }

  /** Token-budget mixture sampling — the data-mixing step of a training
    * run: given target shares per domain (e.g. web 60% / code 30% /
    * books 10%) and a total token budget, derive each domain's keep rate
    * from its actual token mass and hash-sample documents to hit the
    * mixture. Domains with less mass than their target keep everything
    * (rate caps at 1 — no upsampling; repeat-epoch decisions live in the
    * trainer, not the sampler). Unlisted domains default to share 0.
    *
    * Scale shape: one aggregate scan computes per-domain token mass
    * (map-side combined, domain-cardinality rows), the rate table is
    * BROADCAST back, and the keep decision is the same pushdown-friendly
    * deterministic hash filter as [[uniform]] — re-runs and retries keep
    * identical rows.
    *
    * @return kept docs as (doc_id, domain, n_tokens, keep_rate) —
    *         keep_rate carried so downstream loss reweighting can
    *         importance-correct if desired.
    */
  def tokenBudgetMixture(docs: DataFrame, id: Column, text: Column,
      domain: Column, shares: Map[String, Double], totalBudget: Long,
      seed: Long): DataFrame = {
    val base = docs.select(id.as("doc_id"), domain.as("domain"),
      size(graft.text.TextAnalysis.tokens(text)).cast("long").as("n_tokens"))
    val share = shares.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (s, w)) => when(col("domain") === lit(s), lit(w)).otherwise(acc)
    }
    val rates = base.groupBy("domain").agg(sum("n_tokens").as("mass"))
      .select(col("domain"), least(lit(1.0),
        share * totalBudget.toDouble / col("mass").cast("double")).as("keep_rate"))
    base.join(broadcast(rates), "domain")
      .where(Hashing.rand01(seed, col("doc_id")) < col("keep_rate"))
      .select(col("doc_id"), col("domain"), col("n_tokens"),
        // raw: share·budget/mass is a fixed-order product/division of
        // exact operands, bit-identical across engines — no round
        col("keep_rate"))
  }

  /** Deterministic epoch shuffle + round-robin sharding — the
    * training-run data-order pass: a seeded hash permutation gives
    * every epoch a different but REPRODUCIBLE global order (seed =
    * epoch number), and `shard = pos % n` balances shards to ±1 row by
    * construction, with `pos_in_shard` the within-shard read order.
    *
    * The global position is a range-sort on (hash, id) + zipWithIndex
    * (one count job for partition offsets, then a lazy local index) —
    * the hub-safe distributed-rank shape of
    * [[graft.graph.RandomWalks]]'s adjacency, never a single-partition
    * window. Re-runs, retries, and cluster-size changes all reproduce
    * the same (pos, shard) for every row. */
  def epochShuffle(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      id: Column, seed: Long, nShards: Int): DataFrame = {
    import spark.implicits._
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val parts = spark.sessionState.conf.numShufflePartitions
    val hashed = docs.select(id.cast("long").as("doc_id"),
      Hashing.hash60(seed, id.cast("string")).as("h"))
    hashed.repartitionByRange(parts, col("h"), col("doc_id"))
      .sortWithinPartitions("h", "doc_id")
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getLong(0), r.getLong(1), i) }
      .toDF("doc_id", "shuffle_hash", "pos")
      .select(col("doc_id"), col("shuffle_hash"), col("pos"),
        (col("pos") % nShards).as("shard"),
        expr(s"pos DIV $nShards").as("pos_in_shard"))
  }
}
