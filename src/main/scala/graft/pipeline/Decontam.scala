package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, KmvSketch}

/** Incremental decontamination on STANDING KMV synopses — the
  * steady-state consumer the KMV family was built for (VERDICT r8 #5,
  * the builder's own round-9 candidate): one k-minimum-values synopsis
  * of word-8-gram fingerprints per training source is the maintained
  * state; a refresh batch is aggregated ALONE (the only scan the
  * refresh pays), folded into each source's synopsis with the O(k)
  * array merge, and the contamination matrix against the held-out eval
  * set is recomputed from synopses alone — per refresh the standing
  * corpus is read ZERO times, which is the property that matters when
  * the corpus is 100 TB and the nightly batch is 100 GB.
  *
  * Contrast d_decontam_inc: that gate PROVES the merge is lossless
  * (same_synopsis ≡ full recompute) and pins exact truth columns, so it
  * must rescan everything; this operator is the production refresh path
  * those proofs license. KMV set algebra per Beyer et al., SIGMOD 2007
  * ([[graft.functions.KmvSketch]]).
  */
object Decontam {

  /** Distinct (source, h) word-`n`-gram fingerprints of `docs` — the
    * tokens column is materialized BEFORE the shingle transform
    * (inlining tokens(text) inside the higher-order expression
    * re-evaluates the tokenizer per array element; measured 14.8 s vs
    * 1 s at sf0.1, see d_decontam_inc). */
  def shingleHashes(docs: DataFrame, n: Int = 8): DataFrame =
    docs.select(col("source"),
        graft.text.TextAnalysis.tokens(col("text")).as("toks"))
      // fused native shingle hashing (r13, ShingleHashesExpr)
      .select(col("source"),
        explode(graft.functions.ShingleHashesExpr.shingleHashes(
          col("toks"), n)).as("h"))
      .distinct()

  /** Bootstrap the standing state from the standing corpus: one synopsis
    * per training source plus the eval-set synopsis (`evalSource`, all
    * of it — the eval set is held out, not refreshed). Returned frames
    * are localCheckpoint-materialized — the in-session stand-in for the
    * stored synopsis table a deployment persists between refreshes.
    * @return (per-source (source, sk_base), 1-row (sk_eval)) */
  def standingState(standingDocs: DataFrame, evalSource: String,
      k: Int, n: Int = 8): (DataFrame, DataFrame) = {
    val sh = shingleHashes(standingDocs, n)
    val perSrc = sh.where(col("source") =!= evalSource)
      .groupBy("source").agg(KmvSketch.kmv(col("h"), k).as("sk_base"))
      .localCheckpoint()
    val evalSk = sh.where(col("source") === evalSource)
      .agg(KmvSketch.kmv(col("h"), k).as("sk_eval"))
      .localCheckpoint()
    (perSrc, evalSk)
  }

  /** O(k) synopsis merge: fold per-source batch synopses into the
    * standing ones. A source seen only on one side passes through
    * (full-outer) — new-in-batch sources enter the state here. Both
    * inputs are (source, <skCol>) frames; output is (source, sk_base)
    * so the result can be fed back in as next refresh's standing state
    * (the streaming fold, [[graft.streaming.DecontamStreams]]). */
  def mergeSynopses(standingSk: DataFrame, batchSk: DataFrame,
      k: Int): DataFrame =
    standingSk.join(batchSk, Seq("source"), "full_outer")
      .select(col("source"),
        when(col("sk_batch").isNull, col("sk_base"))
          .when(col("sk_base").isNull, col("sk_batch"))
          .otherwise(KmvSketch.unionOf(col("sk_base"), col("sk_batch"), k))
          .as("sk_base"))

  /** The contamination matrix from synopses ALONE — no corpus access.
    * @return (source, kk, rho, est_union, inter_est) per source */
  def matrix(perSourceSk: DataFrame, evalSk: DataFrame, k: Int): DataFrame =
    perSourceSk
      .crossJoin(broadcast(evalSk))
      .withColumn("uni", KmvSketch.unionOf(col("sk_base"), col("sk_eval"), k))
      .withColumn("kk", size(col("uni")).cast("long"))
      .withColumn("rho", size(array_intersect(
        array_intersect(col("uni"), col("sk_base")), col("sk_eval")))
        .cast("long"))
      .withColumn("est_union", KmvSketch.estimate(col("uni"), k))
      .select(col("source"), col("kk"), col("rho"), col("est_union"),
        (floor(col("rho").cast("double") / col("kk") * col("est_union")
          * lit(1e4) + lit(0.5)) / lit(1e4)).as("inter_est"))

  /** Per-source synopses of a refresh batch (the only scan a refresh
    * pays). `evalSource` rows are ignored — the eval set does not grow. */
  def batchSynopses(batchDocs: DataFrame, evalSource: String, k: Int,
      n: Int = 8): DataFrame =
    shingleHashes(batchDocs, n)
      .where(col("source") =!= evalSource)
      .groupBy("source").agg(KmvSketch.kmv(col("h"), k).as("sk_batch"))

  /** One refresh: aggregate ONLY `batchDocs`, O(k)-merge into the
    * standing synopses, re-estimate the contamination matrix from
    * synopses alone. A source seen only in the batch enters the matrix
    * with its batch synopsis (full-outer merge); `evalSource` rows in
    * the batch are ignored (the eval set does not grow).
    * @return (source, kk, rho, est_union, inter_est) per source */
  def refresh(standingSk: DataFrame, evalSk: DataFrame,
      batchDocs: DataFrame, evalSource: String, k: Int,
      n: Int = 8): DataFrame =
    matrix(mergeSynopses(standingSk, batchSynopses(batchDocs, evalSource, k, n), k),
      evalSk, k)
}
