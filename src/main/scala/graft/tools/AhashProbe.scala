package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.pipeline.Multimodal

/** Clean-JVM adjudication probe for the bench's `ahash_index` trio
  * (probe/brute/auto + dup variants) — the SetSimProbe pattern applied
  * to round 12's one unadjudicated drift (driver run 5.47/1.36/1.63 s
  * vs r11's 2.20/0.42/0.60 on a control only 1.08× elevated).
  *
  * Reproduces the bench section EXACTLY (same corpus construction,
  * same session confs, same stats terminal), in a fresh JVM with no
  * preceding bench sections — so the number is free of the ivfpq
  * section's old-gen pressure — and additionally prints:
  *
  *  - the q1_agg control (host-noise anchor, 3 reps);
  *  - the regime [[Multimodal.aHashNearDupAuto]] selects (sc, bc,
  *    bruteOk) — ruling the r12 overflow-safe crossover fix
  *    (`sc <= bruteMaxPairs / bc`) in or out as a regime flip;
  *  - all reps (not just medians) for probe/brute/auto and the dup
  *    trio.
  *
  * usage: runMain graft.tools.AhashProbe [sfDir]
  */
object AhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.memoize", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def reps(label: String, n: Int)(f: => Unit): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-18s ${ts.map(t => f"$t%.3f").mkString(" ")} s")
    }

    // host-noise control: the bench's q1_agg floor
    materialize(graft.SparkEntry.queries("q1_agg")(spark, sfDir)) // warm
    reps("control_q1_agg", 3)(
      materialize(graft.SparkEntry.queries("q1_agg")(spark, sfDir)))

    // === identical corpus construction to Bench section("ahash_index")
    val bound = 1L << 32
    def fp(ids: DataFrame): DataFrame = ids.select(
      col("id").as("doc_id"), lit(0L).as("frame_idx"),
      pmod(Hashing.hash60(concat(lit("alo"), col("id"))), lit(bound))
        .as("ahash_lo"),
      pmod(Hashing.hash60(concat(lit("ahi"), col("id"))), lit(bound))
        .as("ahash_hi"))
    val standing = fp(spark.range(200000).toDF("id")).localCheckpoint()
    val batch = fp(spark.range(200000).toDF("id")
        .where(col("id") % 100 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("frame_idx"),
        col("ahash_lo"), col("ahash_hi"))
      .select(col("doc_id"), col("frame_idx"),
        expr("CASE WHEN (doc_id div 100) % 2 = 0 THEN ahash_lo ^ " +
          "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 32 AS INT)) " +
          "ELSE ahash_lo END").as("ahash_lo"),
        expr("CASE WHEN (doc_id div 100) % 2 <> 0 THEN ahash_hi ^ " +
          "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 32 AS INT)) " +
          "ELSE ahash_hi END").as("ahash_hi"))
      .localCheckpoint()
    val index = Multimodal.aHashIndex(standing).localCheckpoint()
    def fpDup(ids: DataFrame): DataFrame = ids.select(
      col("id").as("doc_id"), lit(0L).as("frame_idx"),
      pmod(Hashing.hash60(concat(lit("dlo"), col("id") % 1000)),
        lit(bound)).as("ahash_lo"),
      pmod(Hashing.hash60(concat(lit("dhi"), col("id") % 1000)),
        lit(bound)).as("ahash_hi"))
    val standingDup = fpDup(spark.range(200000).toDF("id")).localCheckpoint()
    val batchDup = fpDup(spark.range(200000).toDF("id")
        .where(col("id") % 100 === 0))
      .select((col("doc_id") + 1000000L).as("doc_id"), col("frame_idx"),
        col("ahash_lo"), col("ahash_hi"))
      .select(col("doc_id"), col("frame_idx"),
        expr("CASE WHEN (doc_id div 100) % 2 = 0 THEN ahash_lo ^ " +
          "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 32 AS INT)) " +
          "ELSE ahash_lo END").as("ahash_lo"),
        expr("CASE WHEN (doc_id div 100) % 2 <> 0 THEN ahash_hi ^ " +
          "shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 32 AS INT)) " +
          "ELSE ahash_hi END").as("ahash_hi"))
      .localCheckpoint()
    val indexDup = Multimodal.aHashIndex(standingDup).localCheckpoint()

    // regime check: the exact arithmetic aHashNearDupAuto runs
    val sc = standing.count(); val bc = batch.count()
    val bruteMaxPairs = 10000000000L
    val bruteOk = bc == 0L || sc <= bruteMaxPairs / bc
    println(s"auto regime: standing=$sc batch=$bc " +
      s"pairs=${sc * bc} bruteOk=$bruteOk " +
      s"(picks ${if (bruteOk) "BRUTE" else "PROBE"})")

    def stats(df: DataFrame): Unit =
      materialize(Multimodal.aHashNearDupStats(df))
    def probe(): Unit =
      stats(Multimodal.aHashNearDupProbe(index, standing, batch, 8))
    def brute(): Unit =
      stats(Multimodal.aHashNearDupBrute(standing, batch, 8))
    def auto(): Unit =
      stats(Multimodal.aHashNearDupAuto(index, standing, batch, 8))
    def probeDup(): Unit =
      stats(Multimodal.aHashNearDupProbe(indexDup, standingDup, batchDup, 8))
    def bruteDup(): Unit =
      stats(Multimodal.aHashNearDupBrute(standingDup, batchDup, 8))
    def autoDup(): Unit =
      stats(Multimodal.aHashNearDupAuto(indexDup, standingDup, batchDup, 8))

    probe(); brute(); auto(); probeDup(); bruteDup(); autoDup() // warm
    System.gc()
    reps("ahash_probe", 3)(probe())
    reps("ahash_brute", 3)(brute())
    reps("ahash_auto", 3)(auto())
    reps("ahash_dup_probe", 3)(probeDup())
    reps("ahash_dup_brute", 3)(bruteDup())
    reps("ahash_dup_auto", 3)(autoDup())

    // control again: did the host drift DURING the probe?
    reps("control_q1_agg2", 3)(
      materialize(graft.SparkEntry.queries("q1_agg")(spark, sfDir)))
    spark.stop()
  }
}
