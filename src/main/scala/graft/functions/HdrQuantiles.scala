package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, NumericType}

/** Mergeable quantile sketch over non-negative BIGINT values using
  * HDR-histogram binning (Tene, "HdrHistogram: a high dynamic range
  * histogram", hdrhistogram.org; the log-bucket/linear-sub-bucket layout):
  * each value lands in one of ≤ 4033 bins — exponent e = ⌊log₂ v⌋ plus a
  * 6-bit sub-bucket — so the shuffle carries one bounded count array per
  * group instead of the values, and quantile reads are a cumulative scan.
  * Guaranteed relative error ≤ 2⁻⁶ ≈ 1.6% (the reference's exact
  * kv_stats-style scans, `/root/reference/mapreduce-7Apr14/src/
  * mapreduce.cpp`, keep all values; this is the shape that survives a
  * 100 TB column).
  *
  * Everything is integer arithmetic — bin index, counts, cumulative
  * ranks, and the reported value (the bin's LOWER bound) — plus one
  * `ceil(q·n)` whose double product is identical IEEE in Spark and
  * DuckDB, so a SQL replica reproduces results bit-for-bit and the
  * estimator is trivially merge-order independent (bin counts add).
  *
  * Negative inputs clamp to bin 0 (the v=0 bin); NULLs are skipped.
  */
case class HdrQuantiles(
    child: Expression,
    quantiles: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  import HdrQuantiles._

  override def left: Expression = child
  override def right: Expression = quantiles

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hdrq expects a BIGINT value, got ${child.dataType.simpleString}")
    else if (!quantiles.foldable ||
        !(quantiles.dataType match {
          case ArrayType(et: NumericType, _) => et != null
          case _ => false
        }))
      TypeCheckResult.TypeCheckFailure(
        "hdrq expects a foldable numeric array of quantiles")
    else if (try {
        // the type check is the last gate before qs reads the ArrayData
        // positionally — a NULL element there would silently read as 0.0
        val arr = quantiles.eval(null).asInstanceOf[ArrayData]
        arr == null || (0 until arr.numElements()).exists(arr.isNullAt)
      } catch { case _: Exception => true })
      TypeCheckResult.TypeCheckFailure(
        "hdrq quantiles must be a non-null array without null elements")
    else if (try qs.exists(q => q < 0.0 || q > 1.0) catch { case _: Exception => true })
      TypeCheckResult.TypeCheckFailure(
        "hdrq quantiles must all lie in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  // SQL literals like array(0.5) arrive as ARRAY<DECIMAL>; normalize
  private lazy val qs: Array[Double] = {
    val et = quantiles.dataType.asInstanceOf[ArrayType].elementType
    val arr = quantiles.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      et match {
        case DoubleType => arr.getDouble(i)
        case FloatType => arr.getFloat(i).toDouble
        case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
        case IntegerType => arr.getInt(i).toDouble
        case LongType => arr.getLong(i).toDouble
        case other => throw new IllegalArgumentException(
          s"unsupported quantile element type $other")
      }
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(binOf(v.asInstanceOf[Long])) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bins) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < Bins) { n += buf(i); i += 1 }
    val out = new Array[Long](qs.length)
    var j = 0
    while (j < qs.length) {
      out(j) = if (n == 0L) 0L else {
        val r = math.max(math.ceil(qs(j) * n).toLong, 1L)
        var cum = 0L
        var idx = 0
        var found = Bins - 1
        var done = false
        while (idx < Bins && !done) {
          cum += buf(idx)
          if (cum >= r) { found = idx; done = true }
          idx += 1
        }
        lowerOf(found)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sparse (idx, count) pairs — the buffer is mostly zeros. */
  override def serialize(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < Bins) { if (buf(i) != 0L) nz += 1; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + nz * 12)
    bb.putInt(nz)
    i = 0
    while (i < Bins) {
      if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](Bins)
    var nz = bb.getInt()
    while (nz > 0) { buf(bb.getInt()) = bb.getLong(); nz -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HdrQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HdrQuantiles =
    copy(child = l, quantiles = r)
  override def prettyName: String = "hdrq"
}

object HdrQuantiles {
  /** Sub-bucket bits: 64 linear sub-buckets per power of two. */
  val M = 6
  /** Bin 0 holds v ≤ 0; exponents 0..62 each contribute ≤ 64 bins. */
  val Bins: Int = 1 + 63 * 64

  /** e = ⌊log₂ v⌋; sub-bucket = top M+1 bits; idx = 1 + 64e + offset. */
  def binOf(v: Long): Int = {
    if (v <= 0L) 0
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sub = v >>> math.max(e - M, 0)
      (1L + 64L * e + (sub - (1L << math.min(e, M)))).toInt
    }
  }

  /** Lower bound of a bin — the reported (deterministic) quantile value. */
  def lowerOf(idx: Int): Long = {
    if (idx <= 0) 0L
    else {
      val e = (idx - 1) / 64
      val off = (idx - 1) % 64
      if (e <= M) (1L << e) + off
      else ((1L << M) + off.toLong) << (e - M)
    }
  }

  /** Column form: `hdrQuantiles(v, Seq(0.5, 0.95))` → ARRAY<BIGINT>. */
  def hdrQuantiles(value: Column, qs: Seq[Double]): Column =
    Bridge.column(HdrQuantiles(Bridge.expression(value),
      Literal.create(qs.toArray, ArrayType(DoubleType))).toAggregateExpression())

  /** DuckDB replica of the whole sketch for oracle SQL: same bins (via
    * `length(bin(v))` for ⌊log₂⌋), same ceil-rank, same lower-bound
    * report. `valueExpr` must be BIGINT ≥ 0. Yields one row per
    * `$groupCol` with a column per (alias, q) pair. */
  def oracleSql(table: String, valueExpr: String, groupCol: String,
      qs: Seq[(String, Double)]): String = {
    val qvalues = qs.map { case (_, q) => s"($q)" }.mkString(", ")
    val qcols = qs.map { case (alias, q) =>
      s"max(CASE WHEN q = $q THEN lo END) AS $alias" }.mkString(",\n  ")
    s"""WITH vals AS (SELECT $groupCol AS g, $valueExpr AS v FROM $table
       |  WHERE ($valueExpr) IS NOT NULL),
       |bins AS (
       |  SELECT g,
       |    CASE WHEN v <= 0 THEN 0 ELSE
       |      1 + 64*(length(bin(v))-1)
       |        + ((v >> greatest(length(bin(v))-1-$M, 0))
       |           - (1 << least(length(bin(v))-1, $M)))
       |    END AS idx, count(*) AS cnt
       |  FROM vals GROUP BY 1, 2),
       |tot AS (SELECT g, sum(cnt) AS n FROM bins GROUP BY 1),
       |cum AS (SELECT g, idx,
       |  sum(cnt) OVER (PARTITION BY g ORDER BY idx) AS cum FROM bins),
       |ranks AS (SELECT g, q, CAST(greatest(ceil(q*n), 1) AS BIGINT) AS r
       |  FROM tot, (VALUES $qvalues) t(q)),
       |pick AS (SELECT r.g, r.q, min(c.idx) AS idx FROM ranks r JOIN cum c
       |  ON c.g = r.g AND c.cum >= r.r GROUP BY 1, 2),
       |rep AS (SELECT g, q,
       |  CASE WHEN idx = 0 THEN CAST(0 AS BIGINT)
       |       WHEN (idx-1)//64 <= $M
       |         THEN (CAST(1 AS BIGINT) << ((idx-1)//64)) + (idx-1)%64
       |       ELSE ((CAST(1 AS BIGINT) << $M) + (idx-1)%64) << ((idx-1)//64 - $M)
       |  END AS lo
       |  FROM pick)
       |SELECT g AS $groupCol,
       |  $qcols
       |FROM rep GROUP BY 1""".stripMargin
  }
}
