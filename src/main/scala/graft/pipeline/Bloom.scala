package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Distributed Bloom filter over the portable hash60 — the prefilter
  * escape hatch documented on [[Dedup.exactIncremental]], now a
  * first-class operator.
  *
  * Shape: the filter is a DataFrame of packed 32-bit words
  * `(w BIGINT, bits BIGINT)` built by one explode + one `bit_or`
  * group-by over the item digests — `mBits/32` rows total (a 2^20-bit
  * filter is 32 768 rows ≈ 512 KB), small enough to BROADCAST to every
  * executor. Membership is then a broadcast join: the 100 TB candidate
  * side never shuffles, each candidate tests its k bits map-side and
  * reduces to one boolean per key. No false negatives ever; false
  * positives at the classic (1 − e^(−kn/m))^k rate, removed downstream
  * by the exact anti-join in [[exactIncrementalBloom]].
  *
  * All positions are pure integer functions of hash60, so the whole
  * filter — packing included — is replayed bit-for-bit by the DuckDB
  * oracle (`bloomWordsSqlCte` / `bloomProbeSql`).
  *
  * Words are 32-bit in a BIGINT slot so `1 << bit` stays positive in
  * both engines (a 63-shift flips the BIGINT sign in Spark and
  * overflows in DuckDB's checked `<<`).
  */
object Bloom {

  /** The k bit positions of one value: hash60(seed+j, value) % mBits. */
  private def positions(value: Column, mBits: Int, k: Int, seed: Long): Column =
    array((0 until k).map(j => Hashing.hash60(seed + j, value) % mBits): _*)

  /** Build the packed filter: (w BIGINT, bits BIGINT), one row per
    * 32-bit word that has at least one bit set. */
  def build(items: DataFrame, value: Column,
      mBits: Int = 1 << 20, k: Int = 3, seed: Long = 7L): DataFrame =
    items.select(explode(positions(value, mBits, k, seed)).as("pos"))
      .select(expr("pos DIV 32").as("w"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))

  /** Probe: one row per candidate key, `maybe_seen` true iff ALL k bits
    * are set. The filter side is broadcast; the candidate side stays
    * map-side until the final per-key AND (a groupBy on the candidate
    * key, k rows each). */
  def mayContain(filter: DataFrame, candidates: DataFrame, id: Column,
      value: Column, mBits: Int = 1 << 20, k: Int = 3, seed: Long = 7L): DataFrame =
    candidates
      .select(id.as("cand_id"), explode(positions(value, mBits, k, seed)).as("pos"))
      .withColumn("w", expr("pos DIV 32"))
      .join(broadcast(filter), Seq("w"), "left")
      .select(col("cand_id"),
        (col("bits").isNotNull &&
          expr("bits & shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))") =!= lit(0L))
          .as("hit"))
      .groupBy("cand_id").agg(min(col("hit")).as("maybe_seen"))

  /** [[Dedup.exactIncremental]] with the Bloom prefilter wired in: only
    * candidates the filter flags pay the digest anti-join shuffle;
    * definite-new docs bypass it entirely. No false negatives means the
    * bypass is sound; the anti-join kills the false positives, so the
    * result is row-for-row IDENTICAL to the unfiltered operator (the
    * gate asserts this by sharing `d_exact_inc`'s oracle). At 100 TB
    * the win is the shuffle: the anti-join input shrinks from every new
    * doc to the maybe-seen sliver (true dups + the FP rate). */
  def exactIncrementalBloom(newDocs: DataFrame, existing: DataFrame,
      id: Column, text: Column,
      mBits: Int = 1 << 20, k: Int = 3, seed: Long = 7L): DataFrame = {
    val newH = newDocs.select(id.as("doc_id"), Hashing.hash60(text).as("content_hash"))
    val oldH = existing.select(Hashing.hash60(text).as("content_hash")).distinct()
    val filt = build(oldH, col("content_hash"), mBits, k, seed)
    val flags = mayContain(filt, newH, col("doc_id"), col("content_hash"), mBits, k, seed)
    val flagged = newH.join(flags.where(col("maybe_seen")).select("cand_id"),
      newH("doc_id") === col("cand_id"), "left_semi")
    val definiteNew = newH.join(flags.where(!col("maybe_seen")).select("cand_id"),
      newH("doc_id") === col("cand_id"), "left_semi")
    val survivors = flagged.join(oldH, Seq("content_hash"), "left_anti")
    definiteNew.unionByName(survivors)
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "content_hash")
  }

  // ---- DuckDB oracle fragments ----

  /** CTE body for the packed words of a filter over `srcSql`, a query
    * yielding one column `hv` (the values to insert). */
  def bloomWordsSqlCte(srcSql: String, mBits: Int, k: Int, seed: Long): String = {
    val posUnion = (0 until k)
      .map(j => s"SELECT ${Hashing.hash60Sql(seed + j, "hv")} % $mBits AS pos FROM src")
      .mkString("\n  UNION ALL ")
    s"""WITH src AS ($srcSql),
       |allpos AS ($posUnion)
       |SELECT pos // 32 AS w, bit_or((CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))) AS bits
       |FROM allpos GROUP BY 1""".stripMargin
  }

  /** Probe expression fragments live in the gate oracle itself (see
    * PipelineQueries `d_bloom`) — kept there so the whole query reads
    * as one statement. */
}
