package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro-Winkler similarity — the standard fuzzy-match
  * scorer for entity resolution (names, titles, addresses), which Spark
  * lacks (it ships only `levenshtein`). Semantics are pinned to the
  * published algorithm exactly as DuckDB's `jaro_winkler_similarity`
  * computes it (probed empirically, see JaroWinklerSpec): match window
  * `max(|a|,|b|)/2 − 1`, transpositions over matched sequences, Winkler
  * prefix bonus `ℓ·0.1·(1−jaro)` with ℓ = common prefix capped at 4,
  * applied only above the 0.7 boost threshold, and 0.0 when either side
  * is empty (DuckDB returns 0 even for ''==''). That pin is what lets
  * fuzzy-match gates be verified by the DuckDB oracle — for ASCII
  * inputs (this walks chars, DuckDB walks UTF-8 bytes; see
  * [[JaroWinklerImpl.similarity]] for the exact boundary).
  *
  * Stays inside whole-stage codegen: `doGenCode` emits one static call,
  * the same pattern Spark's own levenshtein uses (and [[Hash60]] here).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerImpl.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.JaroWinklerImpl.similarity($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

/** Static helper (plain object, no companion class — generated Java calls
  * the forwarder directly, as with [[Hash60Impl]]). */
object JaroWinklerImpl {

  private val PrefixScale = 0.1
  private val BoostThreshold = 0.7
  private val MaxPrefix = 4

  def similarity(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)

  /** Jaro-Winkler over Java chars. Oracle parity holds for ASCII text
    * ONLY: DuckDB walks UTF-8 BYTES, so any multi-byte char — even BMP,
    * e.g. 'é' (1 Java char, 2 UTF-8 bytes) — changes lengths, the match
    * window, and the prefix count between the two engines. The
    * DuckDB-verified gates feed ASCII name columns (TPC-H p_name);
    * non-ASCII input is well-defined here (per-CHARACTER distance,
    * arguably the more useful unit) but must not be gated against
    * DuckDB's byte-wise score. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0

    // Jaro: greedy in-window matching, then transposition count over the
    // matched subsequences. The window clamps at 0 (same-position-only):
    // for two 1-char strings the textbook max/2−1 is −1, and DuckDB
    // scores jw('c','c') = 1.0 — caught by FuzzyProps, pinned by probe.
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    var transpositions = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0

    if (jaro <= BoostThreshold) return jaro
    var prefix = 0
    val pMax = math.min(MaxPrefix, math.min(l1, l2))
    while (prefix < pMax && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * PrefixScale * (1.0 - jaro)
  }
}

object JaroWinklerFn {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column wrapper: `jaroWinkler($"a", $"b")` → DOUBLE in [0,1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
