package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Portable deterministic hashing shared by the Spark engine and the
  * DuckDB oracle SQL.
  *
  * The reference engine partitions and groups with Bob Jenkins'
  * `hashlittle` (`/root/reference/mapreduce-7Apr14/src/hash.cpp:1-40`) and
  * derives per-vertex randomness with `srand48(v + seed)`
  * (`/root/reference/mapreduce-7Apr14/oink/luby_find.cpp:130-133`). Parity
  * does not require the identical hash function, only identical *grouping*
  * and *deterministic, partitioning-independent* randomness. We therefore
  * standardize on a 60-bit integer drawn from the md5 hex digest, which
  * both Spark (`conv(substring(md5(x),1,15),16,10)`) and DuckDB
  * (`CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) compute identically —
  * this is what lets hash-dependent operators (MinHash, SimHash, R-MAT,
  * Luby priorities) be verified against a SQL oracle.
  */
object Hashing {

  /** 60-bit non-negative hash of a string column (15 hex digits of md5).
    * Computed by the native codegen'd [[Hash60]] expression — bit-equal
    * to the composed `conv(substring(md5(x),1,15),16,10)` documented
    * above (the DuckDB oracle keeps using that SQL), minus the two hex
    * string round-trips per row. Non-string inputs hash their decimal
    * STRING rendering, matching the SQL builder and the oracle's
    * varchar md5. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Hash60(org.apache.spark.sql.graftbridge.Bridge.expression(c.cast("string"))))

  /** Seeded variant: hash60 of "seed|x". Deterministic per (seed, value),
    * independent of partitioning — the Spark analogue of the reference's
    * vertex-keyed `srand48(v + seed)` trick. */
  def hash60(seed: Long, c: Column): Column =
    hash60(concat_ws("|", lit(seed), c))

  /** Uniform double in [0, 1) derived from hash60. */
  def rand01(seed: Long, c: Column): Column =
    hash60(seed, c).cast("double") / lit(Hash60Max.toDouble)

  /** Seeded variant with a column seed (e.g. one row per hash function
    * id): hash60 of "seed|x". */
  def hash60c(seed: Column, c: Column): Column =
    hash60(concat_ws("|", seed, c))

  /** Exclusive upper bound of hash60 (2^60). */
  val Hash60Max: Long = 1L << 60

  /** Driver-side (plain JVM) hash60 of a string — identical value to the
    * Spark/DuckDB expressions. Used to fabricate deterministic constants
    * (e.g. LSH hyperplanes) that both engines can re-derive. */
  def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Driver-side uniform double in [0,1) — see [[rand01]]. */
  def rand01Local(seed: Long, s: String): Double =
    hash60Local(s"$seed|$s").toDouble / Hash60Max.toDouble

  // ---- matching DuckDB SQL fragments (for oracle construction) ----

  def hash60Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr),1,15)) AS BIGINT)"

  def hash60Sql(seed: Long, expr: String): String =
    hash60Sql(s"concat_ws('|', '$seed', $expr)")

  def rand01Sql(seed: Long, expr: String): String =
    s"(${hash60Sql(seed, expr)} / 1152921504606846976.0)"
}
