package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Register-level companions to [[HllSketch60]] that make HLL sketches
  * FIRST-CLASS VALUES instead of only an aggregation result — the piece
  * the neighborhood-function/HyperBall iteration needs (Boldi, Rosa,
  * Vigna, "HyperANF: approximating the neighbourhood function of very
  * large graphs on a budget", WWW 2011): per-vertex sketches live in a
  * BINARY column, rounds union them along edges, and a group-max merge
  * is the only shuffle payload (256 B per vertex, never vertex sets).
  *
  *  - [[Hll60Regs]]: aggregates hash60 values into the raw 256-byte
  *    register blob (update math identical to [[HllSketch60]]).
  *  - [[HllUnion]]: merges register blobs by element-wise max — the
  *    sketch-valued union aggregate.
  *  - [[HllUnionEst]]: same merge, but evaluates to the
  *    [[HllSketch60.estimate]] double.
  *
  * All three share HllSketch60's determinism story: register merges are
  * max (order-independent) and the estimate is exact-power arithmetic,
  * so a DuckDB replica over (v, bucket, rho) rows reproduces every
  * value bit-for-bit.
  */
object HllUnion {
  import HllSketch60.M

  private[functions] def mergeBlob(buf: Array[Byte], blob: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (blob(i) > buf(i)) buf(i) = blob(i); i += 1 }
    buf
  }

  /** Column forms. */
  def hll60Regs(hashed: Column): Column =
    Bridge.column(Hll60Regs(Bridge.expression(hashed)).toAggregateExpression())
  def hllUnion(blob: Column): Column =
    Bridge.column(HllUnion(Bridge.expression(blob)).toAggregateExpression())
  def hllUnionEst(blob: Column): Column =
    Bridge.column(HllUnionEst(Bridge.expression(blob)).toAggregateExpression())
}

/** hash60 BIGINT → 256-byte register blob. */
case class Hll60Regs(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllSketch60._

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll60_regs expects a BIGINT hash60 value, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (h >>> W).toInt & (M - 1)
      val w = h & WMask
      val rho = math.min(if (w == 0L) W + 1
        else java.lang.Long.numberOfLeadingZeros(w) - (64 - W) + 1, RhoCap)
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllUnion.mergeBlob(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): Hll60Regs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Hll60Regs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Hll60Regs =
    copy(child = c)
  override def prettyName: String = "hll60_regs"
}

/** Register blobs → merged register blob (element-wise max). */
case class HllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_union expects a BINARY register blob, got ${child.dataType.simpleString}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch60.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllUnion.mergeBlob(buf, v.asInstanceOf[Array[Byte]]) else buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllUnion.mergeBlob(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllUnion =
    copy(child = c)
  override def prettyName: String = "hll_union"
}

/** Register blobs → merged distinct-count estimate (DOUBLE). */
case class HllUnionEst(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_union_est expects a BINARY register blob, got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](HllSketch60.M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllUnion.mergeBlob(buf, v.asInstanceOf[Array[Byte]]) else buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllUnion.mergeBlob(a, b)
  override def eval(buf: Array[Byte]): Any = HllSketch60.estimate(buf)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllUnionEst =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionEst =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllUnionEst =
    copy(child = c)
  override def prettyName: String = "hll_union_est"
}
