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

/** Sparse log-bin quantile sketch (`lgq`) — the variable-width companion
  * to [[HdrQuantiles]] for heavy-tailed value domains, in the spirit of
  * DDSketch (Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019): bins are
  * log-spaced (width proportional to value, so resolution concentrates
  * where the data lives, not across the full 2^63 range) and the store
  * is SPARSE — state is proportional to the bins the data actually
  * occupies, not to a fixed grid.
  *
  * Versus hdrq: 2^-12 ≈ 0.02% relative error instead of 2^-6 ≈ 1.6%,
  * at the cost of a data-dependent (but loudly bounded) state size —
  * the t-digest trade, made deterministic. A true t-digest adapts
  * centroid widths to the merge ORDER, which no distributed plan can
  * make reproducible; here the bin grid is fixed by the value scheme
  * alone, so merges are bin-wise count sums — associative, commutative,
  * bit-reproducible under any partitioning — and a DuckDB oracle
  * replays the whole sketch exactly (the binning is pure integer
  * bit-math: bitlen + top-M-bits, the same `length(bin(v))` equivalence
  * the HITS rescale uses).
  *
  * State bound: ≤ 2^M bins per occupied octave (worst case 63·2^M ≈
  * 258k sparse entries at M=12 — only reachable by a group whose values
  * span the ENTIRE long range at full density; real columns occupy a
  * few octaves). Serialization caps at [[LogQuantiles.MaxSerializedBins]]
  * entries and FAILS LOUDLY beyond it rather than silently degrading.
  *
  * Negative inputs clamp to bin 0 (the v≤0 bin); NULLs are skipped;
  * the reported value is the containing bin's lower bound at rank
  * ceil(q·n) — [[HdrQuantiles]]' exact conventions.
  */
case class LogQuantiles(
    child: Expression,
    quantiles: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]]
  with BinaryLike[Expression] {

  import LogQuantiles._

  override def left: Expression = child
  override def right: Expression = quantiles

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"lgq expects a BIGINT value, got ${child.dataType.simpleString}")
    else if (!quantiles.foldable ||
        !(quantiles.dataType match {
          case ArrayType(et: NumericType, _) => et != null
          case _ => false
        }))
      TypeCheckResult.TypeCheckFailure(
        "lgq expects a foldable numeric array of quantiles")
    else if (try {
        val arr = quantiles.eval(null).asInstanceOf[ArrayData]
        arr == null || (0 until arr.numElements()).exists(arr.isNullAt)
      } catch { case _: Exception => true })
      TypeCheckResult.TypeCheckFailure(
        "lgq quantiles must be a non-null array without null elements")
    else if (try qs.exists(q => q < 0.0 || q > 1.0) catch { case _: Exception => true })
      TypeCheckResult.TypeCheckFailure(
        "lgq quantiles must all lie in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

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

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  override def update(buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val b = binOf(v.asInstanceOf[Long]).toLong
      buf.put(b, buf.getOrElse(b, 0L) + 1L)
    }
    buf
  }

  override def merge(a: scala.collection.mutable.LongMap[Long],
      b: scala.collection.mutable.LongMap[Long])
      : scala.collection.mutable.LongMap[Long] = {
    b.foreach { case (k, c) => a.put(k, a.getOrElse(k, 0L) + c) }
    a
  }

  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    var n = 0L
    buf.foreach { case (_, c) => n += c }
    val sorted = buf.toArray.sortBy(_._1)
    val out = new Array[Long](qs.length)
    var j = 0
    while (j < qs.length) {
      out(j) = if (n == 0L) 0L else {
        val r = math.max(math.ceil(qs(j) * n).toLong, 1L)
        var cum = 0L
        var idx = 0
        var found = if (sorted.nonEmpty) sorted.last._1 else 0L
        var done = false
        while (idx < sorted.length && !done) {
          cum += sorted(idx)._2
          if (cum >= r) { found = sorted(idx)._1; done = true }
          idx += 1
        }
        lowerOf(found.toInt)
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    if (buf.size > MaxSerializedBins)
      throw new IllegalStateException(
        s"lgq sketch exceeded $MaxSerializedBins occupied bins (" +
          s"${buf.size}) — the group's values span too many octaves at " +
          "full density; coarsen the input scale or use hdrq")
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 12)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) => bb.putInt(k.toInt); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = scala.collection.mutable.LongMap.empty[Long]
    var nz = bb.getInt()
    while (nz > 0) { buf.put(bb.getInt().toLong, bb.getLong()); nz -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): LogQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LogQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LogQuantiles =
    copy(child = l, quantiles = r)
  override def prettyName: String = "lgq"
}

object LogQuantiles {
  /** Sub-bucket bits: 4096 log-spaced sub-buckets per octave →
    * guaranteed relative error ≤ 2^-12 ≈ 0.02%. */
  val M = 12
  /** Loud cap on serialized sparse entries (~1.5 MB at 12 B/entry). */
  val MaxSerializedBins = 131072

  /** e = ⌊log₂ v⌋; sub-bucket = top M+1 bits; idx = 1 + 2^M·e + offset.
    * Monotone in v; values below 2^M land in exact single-value bins. */
  def binOf(v: Long): Int = {
    if (v <= 0L) 0
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sub = v >>> math.max(e - M, 0)
      (1L + (1L << M).toLong * e + (sub - (1L << math.min(e, M)))).toInt
    }
  }

  /** Lower bound of a bin — the reported (deterministic) value. */
  def lowerOf(idx: Int): Long = {
    if (idx <= 0) 0L
    else {
      val e = (idx - 1) >> M
      val off = ((idx - 1) & ((1 << M) - 1)).toLong
      if (e <= M) (1L << e) + off
      else ((1L << M) + off) << (e - M)
    }
  }

  /** Column form: `logQuantiles(v, Seq(0.5, 0.99))` → ARRAY<BIGINT>. */
  def logQuantiles(value: Column, qs: Seq[Double]): Column =
    Bridge.column(LogQuantiles(Bridge.expression(value),
      Literal.create(qs.toArray, ArrayType(DoubleType))).toAggregateExpression())

  /** DuckDB replica of the whole sketch for oracle SQL — the
    * [[HdrQuantiles.oracleSql]] shape with 2^M sub-buckets. `valueExpr`
    * must be BIGINT; yields one row per `$groupCol` with a column per
    * (alias, q) pair. */
  def oracleSql(table: String, valueExpr: String, groupCol: String,
      qs: Seq[(String, Double)]): String =
    oracleSqlGrouped(table, valueExpr, Seq(groupCol -> groupCol), qs)

  /** [[oracleSql]] generalized to a composite group key: each
    * `(expr, alias)` pair in `groupCols` is evaluated against `table`
    * and emitted under `alias` in the final projection. */
  def oracleSqlGrouped(table: String, valueExpr: String,
      groupCols: Seq[(String, String)], qs: Seq[(String, Double)]): String = {
    val w = 1 << M
    val gs = groupCols.indices.map(i => s"g$i")
    val gsel = groupCols.zip(gs).map { case ((e, _), g) => s"$e AS $g" }.mkString(", ")
    val glist = gs.mkString(", ")
    val gout = groupCols.zip(gs).map { case ((_, a), g) => s"$g AS $a" }.mkString(",\n  ")
    val gjoin = gs.map(g => s"c.$g = r.$g").mkString(" AND ")
    val qvalues = qs.map { case (_, q) => s"($q)" }.mkString(", ")
    val qcols = qs.map { case (alias, q) =>
      s"max(CASE WHEN q = $q THEN lo END) AS $alias" }.mkString(",\n  ")
    s"""WITH vals AS (SELECT $gsel, $valueExpr AS v FROM $table
       |  WHERE ($valueExpr) IS NOT NULL),
       |bins AS (
       |  SELECT $glist,
       |    CASE WHEN v <= 0 THEN 0 ELSE
       |      1 + $w*(length(bin(v))-1)
       |        + ((v >> greatest(length(bin(v))-1-$M, 0))
       |           - (1 << least(length(bin(v))-1, $M)))
       |    END AS idx, count(*) AS cnt
       |  FROM vals GROUP BY $glist, idx),
       |tot AS (SELECT $glist, sum(cnt) AS n FROM bins GROUP BY $glist),
       |cum AS (SELECT $glist, idx,
       |  sum(cnt) OVER (PARTITION BY $glist ORDER BY idx) AS cum FROM bins),
       |ranks AS (SELECT $glist, q, CAST(greatest(ceil(q*n), 1) AS BIGINT) AS r
       |  FROM tot, (VALUES $qvalues) t(q)),
       |pick AS (SELECT ${gs.map(g => s"r.$g").mkString(", ")}, r.q,
       |  min(c.idx) AS idx FROM ranks r JOIN cum c
       |  ON $gjoin AND c.cum >= r.r
       |  GROUP BY ${gs.map(g => s"r.$g").mkString(", ")}, r.q),
       |rep AS (SELECT $glist, q,
       |  CASE WHEN idx = 0 THEN CAST(0 AS BIGINT)
       |       WHEN (idx-1)//$w <= $M
       |         THEN (CAST(1 AS BIGINT) << ((idx-1)//$w)) + (idx-1)%$w
       |       ELSE ((CAST(1 AS BIGINT) << $M) + (idx-1)%$w) << ((idx-1)//$w - $M)
       |  END AS lo
       |  FROM pick)
       |SELECT $gout,
       |  $qcols
       |FROM rep GROUP BY $glist""".stripMargin
  }
}
