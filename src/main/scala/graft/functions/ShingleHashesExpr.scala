package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle HASHES over a token array (r13) — the
  * `transform(sequence(…), i ⇒ concat_ws(" ", toks[i..i+n−1])) →
  * hash60(sh)` chain fused into one loop: per shingle, join the token
  * bytes once (identical bytes to `concat_ws(" ", …)`) and md5 them via
  * [[Hash60Impl]]. No interpreted per-shingle lambda, no intermediate
  * string array. Feeds every hash-only shingle consumer (set-similarity,
  * decontamination, containment, overlap) through
  * [[graft.text.TextAnalysis.explodedShingleHashes]]; consumers that
  * need the shingle STRINGS (repetition stats, winnowing) keep the
  * composed form.
  *
  * Returns an empty array when the document is shorter than `n` tokens
  * (the composed `when(size ≥ n)…otherwise(array())` shape — explode
  * then emits no rows either way) and null for a null token array.
  */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashesImpl.eval(input.asInstanceOf[ArrayData], n))

  // The kernel lives in the standalone ShingleHashesImpl object: a
  // companion `eval` would get no static forwarder (the case class
  // inherits Expression.eval), so generated code referencing it fails
  // janino compilation and drops the whole stage to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashesImpl.eval($c, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** Static kernel in a standalone object so the mirror class carries a
  * static `eval` the generated Java can link against. */
object ShingleHashesImpl {
  private val Empty = new Array[Long](0)

  def eval(toks: ArrayData, n: Int): Array[Long] = {
    val nt = toks.numElements()
    if (nt < n) return Empty
    val out = new Array[Long](nt - n + 1)
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= nt - n) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      out(i) = Hash60Impl.hash(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    out
  }
}

object ShingleHashesExpr {
  /** Column API over a PRE-BOUND token-array attribute. */
  def shingleHashes(toks: Column, n: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(toks), n))
}
