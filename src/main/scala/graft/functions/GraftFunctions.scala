package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT cosine_sim(a, b) ...")` works alongside the
  * Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "cosine_sim",
      exprs => CosineSimilarity(exprs.head, exprs(1)))
    Bridge.registerFunction(spark, "hash60", hash60Builder)
    Bridge.registerFunction(spark, "normalize_nfc", normalizeNfcBuilder)
    Bridge.registerFunction(spark, "hll60", hll60Builder)
    Bridge.registerFunction(spark, "hdrq", hdrqBuilder)
    Bridge.registerFunction(spark, "lgq", lgqBuilder)
    // register-level HLL surface (the HyperANF building blocks):
    // hll60_regs(hash60(x)) → blob, hll_union(blob) → blob,
    // hll_union_est(blob) → estimate
    Bridge.registerFunction(spark, "hll60_regs", hll60RegsBuilder)
    Bridge.registerFunction(spark, "hll_union", hllUnionBuilder)
    Bridge.registerFunction(spark, "hll_union_est", hllUnionEstBuilder)
    // KMV distinct-value synopsis: kmv(hash60(x), 256) → ARRAY<BIGINT>
    Bridge.registerFunction(spark, "kmv", kmvBuilder)
  }

  private[graft] def kmvBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2, "kmv expects (BIGINT hash60 value, INT k)")
    KmvSketch(exprs.head, exprs(1)).toAggregateExpression()
  }

  private[graft] def normalizeNfcBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 1, "normalize_nfc expects one string argument")
    NormalizeNfc(exprs.head)
  }

  private[graft] def hll60RegsBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 1, "hll60_regs expects one hash60 argument")
    Hll60Regs(exprs.head).toAggregateExpression()
  }

  private[graft] def hllUnionBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 1, "hll_union expects one register blob")
    HllUnion(exprs.head).toAggregateExpression()
  }

  private[graft] def hllUnionEstBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 1, "hll_union_est expects one register blob")
    HllUnionEst(exprs.head).toAggregateExpression()
  }

  /** SQL surface for the sparse log-bin quantile sketch:
    * `lgq(v, array(0.5, 0.99))` → ARRAY<BIGINT>. */
  private[graft] def lgqBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2,
      "lgq expects (BIGINT value, ARRAY<DOUBLE> quantiles)")
    LogQuantiles(exprs.head, exprs(1)).toAggregateExpression()
  }

  /** SQL surface for the HDR-bin quantile sketch:
    * `hdrq(v, array(0.5, 0.95))` → ARRAY<BIGINT>. */
  private[graft] def hdrqBuilder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 2,
      "hdrq expects (BIGINT value, ARRAY<DOUBLE> quantiles)")
    HdrQuantiles(exprs.head, exprs(1)).toAggregateExpression()
  }

  /** SQL surface for the HLL distinct sketch: `hll60(hash60(x))`. */
  private[graft] def hll60Builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(exprs.length == 1, "hll60 expects exactly one hash60 argument")
    HllSketch60(exprs.head).toAggregateExpression()
  }

  /** SQL surface for the portable 60-bit hash every deterministic
    * operator derives from (same value in DuckDB: see
    * [[Hashing.hash60Sql]]) — `hash60(x)` or seeded `hash60(seed, x)`.
    * Built as raw catalyst nodes (a Column round-trip would hand the
    * analyzer an Unevaluable lazy wrapper). */
  private[graft] def hash60Builder(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.StringType
    // Route every input through StringType: an integral input hashes its
    // DECIMAL STRING, matching the documented DuckDB parity (md5 of the
    // varchar) and the seeded 2-arg form. The native Hash60 expression
    // is bit-equal to the old composed conv/substring/md5 chain.
    def h(e: Expression): Expression = graft.functions.Hash60(Cast(e, StringType))
    exprs match {
      case Seq(x) => h(x)
      case Seq(seed, x) => h(ConcatWs(Seq(Literal("|"),
        Cast(seed, StringType), Cast(x, StringType))))
      case _ => throw new IllegalArgumentException("hash60 expects 1 or 2 arguments")
    }
  }
}
