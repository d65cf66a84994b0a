package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused MinHash signature over a token array (r13) — the
  * word-3-gram chain `explode(shinglesFromTokens) → hash60(sh) % p →
  * 16 × min((a_h·x + b_h) % p)` collapsed into ONE loop per document:
  * build each shingle's bytes (space-joined, exactly `concat_ws(" ", …)`),
  * md5 it through [[Hash60Impl]], and fold the 16 affine mins in place.
  * Replaces an interpreted `transform` lambda + a string allocation per
  * shingle, the exploded shingle rows, and (in the signature operator)
  * the groupBy exchange — the md5 digests, which define the portable
  * hash contract, are the only work left per shingle.
  *
  * Bit-exactness: the shingle string is the identical byte sequence
  * `concat_ws(" ", t_i, t_i+1, t_i+2)` hashed by the identical
  * [[Hash60Impl.hash]]; `% p` and the affine maps are the identical
  * nonnegative long arithmetic; min is exact. PipelineSpec pins the
  * operator against the original aggregate form.
  *
  * Returns `array<long>` of the [[graft.pipeline.Dedup.NumHashes]] mins;
  * null when the document has fewer than `n` tokens (callers filter
  * those rows — the aggregate form simply emitted no group for them).
  */
case class MinHashSigExpr(child: Expression, n: Int,
    a: Seq[Long], b: Seq[Long], p: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string> tokens, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val sigs = MinHashSigImpl.eval(toks, n, aArr, bArr, p)
    if (sigs == null) null else new GenericArrayData(sigs)
  }

  // Codegen: delegate the loop to the static helper (the md5 digest
  // dominates; what matters is removing per-shingle lambda/string/row
  // machinery, not inlining the loop body). The kernel lives in the
  // standalone MinHashSigImpl object — a companion `eval` gets no
  // static forwarder (name clash with Expression.eval) and the
  // generated call would fail janino, dropping the stage to interpreted.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val sigs = ctx.freshName("sigs")
      s"""
         |long[] $sigs = graft.functions.MinHashSigImpl.eval($c, $n, $aRef, $bRef, ${p}L);
         |if ($sigs == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Static kernel in a standalone object so the mirror class carries a
  * static `eval` the generated Java can link against. */
object MinHashSigImpl {

  /** Static kernel shared by eval and codegen. Returns null when fewer
    * than `n` tokens (no shingles — the aggregate form had no group). */
  def eval(toks: ArrayData, n: Int, a: Array[Long], b: Array[Long], p: Long): Array[Long] = {
    val nt = toks.numElements()
    if (nt < n) return null
    val nh = a.length
    val sigs = Array.fill(nh)(Long.MaxValue)
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= nt - n) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      // identical bytes to concat_ws(" ", t_i .. t_{i+n-1})
      val sh = UTF8String.concatWs(space, parts: _*)
      val x = Hash60Impl.hash(sh) % p
      var h = 0
      while (h < nh) {
        val v = (a(h) * x + b(h)) % p
        if (v < sigs(h)) sigs(h) = v
        h += 1
      }
      i += 1
    }
    sigs
  }
}

object MinHashSigExpr {
  /** Column API over a PRE-BOUND token-array attribute. */
  def minHashSig(toks: Column, n: Int, a: Seq[Long], b: Seq[Long], p: Long): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(toks), n, a, b, p))
}
