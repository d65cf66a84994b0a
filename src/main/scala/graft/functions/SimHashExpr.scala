package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native fused 60-bit SimHash over a token array (r13) — the
  * `explode(tokens) → hash60(w) → packed-counter groupBy → majority`
  * chain collapsed into one loop per document: md5 each token once and
  * bump 60 bit counters, then emit Σ 2^j over majority bits. Removes
  * the exploded token rows, the 60-shift packing expression evaluated
  * per token, and the groupBy exchange; the per-token md5 (the portable
  * hash contract) is the only work left.
  *
  * Bit-exactness: counter j counts exactly the tokens whose hash60 has
  * bit j set (duplicates counted per occurrence, as the exploded rows
  * were), and the majority test is the identical `2·ones > ntok`.
  * The packed form's 20-bit counter ceiling is enforced with the same
  * loud failure (the packed aggregate would silently carry into the
  * adjacent slot past 2^20 tokens; [[graft.pipeline.Dedup.simHash]]
  * raises instead, and so does this kernel — same condition and token
  * counts in the message; the row-local kernel cannot name the doc id).
  * Returns null for an empty/absent token array (the aggregate form
  * emitted no group) — callers filter on `size(toks) > 0`.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.eval(input.asInstanceOf[ArrayData])

  // Kernel in the standalone SimHashImpl object — a companion `eval`
  // gets no static forwarder (name clash with Expression.eval) and the
  // generated call would fail janino, dropping the stage to interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      s"""
         |Object $v = graft.functions.SimHashImpl.eval($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $v).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash60"
}

/** Static kernel in a standalone object so the mirror class carries a
  * static `eval` the generated Java can link against. */
object SimHashImpl {
  private val Bits = 60
  private val MaxTokens = (1L << 20) - 1 // the packed form's counter ceiling

  def eval(toks: ArrayData): Object = {
    val nt = toks.numElements()
    if (nt == 0) return null
    if (nt > MaxTokens)
      throw new RuntimeException(
        s"simHash counter overflow: document has $nt tokens (max $MaxTokens)")
    val ones = new Array[Int](Bits)
    var i = 0
    while (i < nt) {
      val h = Hash60Impl.hash(toks.getUTF8String(i))
      var j = 0
      while (j < Bits) {
        ones(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sketch = 0L
    var j = 0
    while (j < Bits) {
      if (2L * ones(j) > nt) sketch |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sketch)
  }
}

object SimHashExpr {
  /** Column API over a PRE-BOUND token-array attribute. */
  def simHash60(toks: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(toks)))
}
