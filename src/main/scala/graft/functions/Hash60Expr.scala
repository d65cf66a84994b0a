package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit md5 hash — bit-identical to the composed
  * form `conv(substring(md5(x), 1, 15), 16, 10)` that defines the
  * engine's portable hash ([[Hashing.hash60]]), but without the two hex
  * round-trips: the built-in chain digests the UTF-8 bytes, renders 32
  * hex chars (UTF8String allocation), substrings them (second
  * allocation), and string-parses base-16 back to a long; this
  * expression takes the first 15 hex digits directly off the digest
  * bytes — big-endian u64 of bytes[0..7] >>> 4. One digest, zero string
  * work, whole-stage codegen via `doGenCode`. It sits under every
  * MinHash shingle hash, SimHash, sampling decision, and R-MAT edge
  * draw, which is why it rates the custom-Expression tier (SURVEY §4.3).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  // Callers cast to string themselves (Hashing.hash60 and the SQL
  // builder both do — the decimal-string semantics are part of the
  // contract); AbstractDataType is private[sql], so ImplicitCastInputTypes
  // is not available to extension code.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hash60 expects a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Hash60Impl.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60Impl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def prettyName: String = "hash60"
}

/** Static digest helper (separate object, no companion class, so the
  * generated Java calls the static forwarder directly). */
object Hash60Impl {
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 as a long: big-endian u64 of digest
    * bytes 0..7, shifted right 4 (drops the 16th hex digit). Always
    * non-negative (60 bits). */
  def hash(s: UTF8String): Long = {
    val d = Md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
