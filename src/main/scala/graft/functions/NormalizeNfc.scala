package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * text-pipeline front door (mixed-crawl corpora carry both composed and
  * decomposed forms of the same glyph; every downstream hash, shingle,
  * and dedup key diverges unless normalization happens first). Spark has
  * no built-in normalizer; DuckDB's `nfc_normalize` implements the same
  * Unicode NFC, so the operator stays oracle-verifiable. */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"normalize_nfc expects a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeNfcImpl.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfcImpl.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)

  override def prettyName: String = "normalize_nfc"
}

object NormalizeNfcImpl {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // quick reject: NFC-normalized is the overwhelmingly common case
    // (all-ASCII always is), and isNormalized avoids the rebuild
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
