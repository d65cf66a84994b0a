package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd squared L2 distance via the dot-product identity
  * |a|² − 2a·b + |b|² — the PQ hot path (r13). The composed form
  * `dot(a,a) − 2·dot(a,b) + dot(b,b)` with
  * `dot = aggregate(zip_with(a,b,*), 0d, +)` evaluates three interpreted
  * higher-order folds and allocates three intermediate arrays per row;
  * the IVF-PQ LUT stage alone evaluates it |Q|·nprobe·subspaces·codewords
  * times (≈1M at bench scale). This expression is one fused loop with
  * three accumulators and participates in whole-stage codegen.
  *
  * Bit-exactness contract (same as [[CosineSimilarity]]): each
  * accumulator is the identical sequential left fold the composed form
  * computes, and the final combine is the identical
  * `(aa − 2.0·ab) + bb`, so results match the previous composed column
  * and the DuckDB oracle's `list_dot_product` SQL bit-for-bit. For
  * `array<float>` inputs the per-element product is computed in FLOAT
  * and then widened — exactly what `zip_with(a, b, _*_)` over float
  * arrays feeds into the double-typed fold. Mismatched lengths → null
  * (zip_with's null padding poisons the composed sum). Null elements
  * are not expected from the parquet embedding columns (same stance as
  * [[CosineSimilarity]]).
  */
case class SqDistL2(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects two array<float> or two array<double> columns, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var aa = 0.0; var ab = 0.0; var bb = 0.0
    var i = 0
    if (elemType == FloatType) {
      while (i < n) {
        val xf = x.getFloat(i); val yf = y.getFloat(i)
        aa += (xf * xf).toDouble; ab += (xf * yf).toDouble; bb += (yf * yf).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        val xd = x.getDouble(i); val yd = y.getDouble(i)
        aa += xd * xd; ab += xd * yd; bb += yd * yd
        i += 1
      }
    }
    java.lang.Double.valueOf(aa - 2.0 * ab + bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val aa = ctx.freshName("aa")
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val body =
        if (elemType == FloatType)
          s"""float $xi = $a.getFloat($i);
             |float $yi = $b.getFloat($i);
             |$aa += (double)($xi * $xi); $ab += (double)($xi * $yi); $bb += (double)($yi * $yi);
           """.stripMargin
        else
          s"""double $xi = $a.getDouble($i);
             |double $yi = $b.getDouble($i);
             |$aa += $xi * $xi; $ab += $xi * $yi; $bb += $yi * $yi;
           """.stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
         |  double $aa = 0.0, $ab = 0.0, $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $body
         |  }
         |  ${ev.value} = $aa - 2.0 * $ab + $bb;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SqDistL2 {
  /** Column API: squared L2 distance of two same-typed array columns. */
  def sqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistL2(Bridge.expression(a), Bridge.expression(b)))
}
