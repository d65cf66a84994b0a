package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd ADC (asymmetric-distance) lookup sum — the IVF-PQ
  * scoring hot loop (r13). The composed form
  * `aggregate(sequence(0, m−1), 0d, (acc, s) ⇒ acc +
  * element_at(lut, s·kw + codes[s] + 1))` allocates a length-m sequence
  * array and runs an interpreted fold with two interpreted element_at
  * calls PER CANDIDATE ROW — ≈1M rows at bench scale. This expression
  * is one fused loop over the codes array, whole-stage-codegen'd.
  *
  * Bit-exactness: the accumulator is the identical sequential left fold
  * in the identical subspace order (s = 0..m−1), each term the identical
  * `lut[s·codewords + codes[s]]` double — results match the composed
  * column bit-for-bit (SqDistL2Spec's sibling assertion in
  * AdcSumSpec pins it).
  *
  * @param codewords codewords per subspace (the LUT stride)
  */
case class AdcSum(left: Expression, right: Expression, codewords: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_sum expects (array<int> codes, array<double> lut), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getDouble(s * codewords + codes.getInt(s))
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $b.getDouble($s * $codewords + $a.getInt($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AdcSum {
  /** Column API: Σ_s lut[s·codewords + codes[s]] in subspace order. */
  def adcSum(codes: Column, lut: Column, codewords: Int): Column =
    Bridge.column(AdcSum(Bridge.expression(codes), Bridge.expression(lut), codewords))
}
