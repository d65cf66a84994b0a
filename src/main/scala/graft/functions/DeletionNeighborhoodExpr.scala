package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native ≤`maxDel`-deletion neighborhood of a string — the FastSS
  * blocking key set (Bocek et al. 2007): every string obtainable by
  * deleting at most `maxDel` characters, the input itself included,
  * deduplicated. Two strings within Levenshtein distance k share a
  * member of their ≤k-deletion neighborhoods, so exploding this array
  * and equi-joining on it is a LOSSLESS edit-distance blocking scheme.
  *
  * Exists as a native expression (rather than the composed higher-order
  * transform [[graft.pipeline.FuzzyMatch]] originally used, kept there
  * as a spec cross-check) for two reasons: the optimizer rule
  * [[graft.plans.FuzzyJoinRewrite]] needs a single Expression node to
  * splice into rewritten plans, and one static-call codegen beats three
  * nested array transforms per row. Works on Unicode code points, so
  * deletions never split surrogate pairs.
  */
case class DeletionNeighborhood(child: Expression, maxDel: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"deletion_neighborhood expects a STRING input, got " +
          child.dataType.simpleString)
    else if (maxDel < 1 || maxDel > 3)
      TypeCheckResult.TypeCheckFailure(
        s"deletion_neighborhood supports maxDel in [1,3], got $maxDel")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DeletionNeighborhoodImpl.variants(input.asInstanceOf[UTF8String], maxDel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeletionNeighborhoodImpl.variants($c, $maxDel)")

  override protected def withNewChildInternal(
      newChild: Expression): DeletionNeighborhood =
    copy(child = newChild)

  override def prettyName: String = "deletion_neighborhood"
}

object DeletionNeighborhoodImpl {

  /** All strings at deletion distance ≤ maxDel from `s` (s included),
    * deduplicated, as Spark ArrayData of UTF8String. */
  def variants(s: UTF8String, maxDel: Int): ArrayData = {
    val out = new java.util.LinkedHashSet[String]()
    var frontier = List(s.toString)
    out.add(s.toString)
    var d = 0
    while (d < maxDel) {
      var next = List.empty[String]
      frontier.foreach { v =>
        // delete one CODE POINT at a time (surrogate-safe)
        var i = 0
        while (i < v.length) {
          val step = Character.charCount(v.codePointAt(i))
          val w = v.substring(0, i) + v.substring(i + step)
          if (out.add(w)) next ::= w
          i += step
        }
      }
      frontier = next
      d += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

object DeletionNeighborhoodFn {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column wrapper: array of ≤maxDel-deletion variants (self included). */
  def deletionNeighborhood(s: Column, maxDel: Int): Column =
    Bridge.column(DeletionNeighborhood(Bridge.expression(s), maxDel))
}
