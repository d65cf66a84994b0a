package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native fused winnowing fingerprints over a token array (r13) — the
  * `transform(windows, j ⇒ aggregate(sequence(j, j+w−1), minStruct))`
  * chain (an interpreted O(n·w) fold with a struct allocation per step,
  * plus the composed shingle-hash transform under it) collapsed into
  * one loop per document: hash the k-gram shingles once
  * ([[ShingleHashesImpl.eval]] — identical bytes/md5), slide the w-wide
  * window keeping the RIGHTMOST minimum (`<=`, exactly the composed
  * fold's tie rule), and emit the distinct (h, pick) structs in first-
  * occurrence order (exactly `array_distinct`'s order).
  *
  * Returns null when the document has fewer than w shingle positions —
  * callers filter on the cheap `size(toks) − k + 1 ≥ w` predicate
  * (guide §4.4: keep the md5 chain out of pushed-down filters).
  */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("pick", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowImpl.eval(input.asInstanceOf[ArrayData], k, w)

  // Kernel in the standalone WinnowImpl object — a companion `eval`
  // gets no static forwarder (name clash with Expression.eval) and the
  // generated call would fail janino, dropping the stage to interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("v")
      s"""
         |Object $v = graft.functions.WinnowImpl.eval($c, $k, $w);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $v; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

/** Static kernel in a standalone object so the mirror class carries a
  * static `eval` the generated Java can link against. */
object WinnowImpl {

  /** Null when there are fewer than w shingle positions. */
  def eval(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val hs = ShingleHashesImpl.eval(toks, k)
    val n = hs.length
    if (n < w) return null
    // distinct (h, pick) in first-occurrence order over windows j asc
    val seen = new java.util.LinkedHashSet[Long]() // picks are unique keys
    val pickH = new Array[Long](n)
    var j = 0
    while (j <= n - w) {
      var bestH = Long.MaxValue
      var bestI = -1L
      var i = j
      while (i < j + w) {
        val hi = hs(i.toInt)
        if (hi <= bestH) { bestH = hi; bestI = i } // rightmost minimum
        i += 1
      }
      if (!seen.contains(bestI)) { seen.add(bestI); pickH(bestI.toInt) = bestH }
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      val pick = it.next()
      out(o) = new GenericInternalRow(Array[Any](pickH(pick.toInt), pick))
      o += 1
    }
    new GenericArrayData(out)
  }
}

object WinnowExpr {
  /** Column API over a PRE-BOUND token-array attribute. */
  def winnowFps(toks: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowExpr(Bridge.expression(toks), k, w))
}
