package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class operator — pandas `merge_asof` parity:
  * for every left row, the single right row among equal keys that is
  * `backward` (largest right-time ≤ t — the default point-in-time
  * lookup), `forward` (smallest right-time ≥ t), or `nearest` (closer
  * of the two, ties backward). LEFT OUTER: no candidate → right columns
  * null; optional `toleranceUs` bounds the time distance. The lookup
  * shape of SCD2 fact enrichment, market-data alignment, and sensor
  * snapping.
  *
  * Why a custom operator: the composable formulations are either a
  * range join + per-fact `row_number` window (the d_scd2_join shape:
  * every fact×covering-version pair materializes BEFORE the top-1
  * filter) or an interval self-join via `lead()` (one extra window over
  * the whole dim per query). This node needs neither: both sides
  * hash-partition on the key and sort by (key, time) — exactly the
  * layout Exchange + SortExec already provide — and one streaming merge
  * emits each left row against a single lagging candidate pointer.
  * O(|L|+|R|) per partition, O(1) memory, no intermediate pair blow-up;
  * at 100 TB nothing but the two key-hash exchanges moves.
  *
  * Reference lineage: generalizes the OINK-style time-keyed lookup the
  * SCD2 suite (`pipeline/Scd2.scala`) composes by hand.
  *
  * Both time expressions must be BIGINT (e.g. `unix_micros`).
  * Determinism requires unique (key, time) on the RIGHT (a versioned
  * dimension satisfies this by construction); equal-time right rows
  * otherwise tie arbitrarily. Null keys group like groupBy (null ==
  * null), matching the SQL `ASOF JOIN ... USING` convention.
  */
case class AsOfJoin(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long], direction: String,
    left: LogicalPlan, right: LogicalPlan,
    broadcast: Boolean = false) extends BinaryNode {
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    s"as-of times must be BIGINT, got ${leftTime.dataType}/${rightTime.dataType}")
  require(AsOfJoin.Directions(direction),
    s"direction must be one of ${AsOfJoin.Directions.mkString("/")}, got $direction")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoin = copy(left = l, right = r)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long], direction: String,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceUs
    val dir = direction
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      // both key projections emit the same row shape: natural ordering
      // on the key data types compares across sides (nulls group first,
      // so null keys match like groupBy)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // lagging right cursor: `next*` is the first unconsumed right row,
      // `cand*` the best (latest ≤ t) candidate of the CURRENT key group
      var nextRow: InternalRow = null
      var nextKey: InternalRow = null
      var nextTime = 0L
      // NULL times would read as 0L through getLong and silently break
      // the merge's monotonicity (nulls sort FIRST under the required
      // ascending order but compare as 0 — wrong with negative times):
      // fail fast with a clear error instead.
      def timeOf(proj: UnsafeProjection, row: InternalRow, side: String): Long = {
        val t = proj(row)
        if (t.isNullAt(0)) throw new IllegalArgumentException(
          s"as-of join: NULL $side-side time value; filter nulls out or " +
          "use a non-nullable time expression (e.g. coalesce to a sentinel)")
        t.getLong(0)
      }
      def advanceRight(): Unit =
        if (rIt.hasNext) {
          nextRow = rIt.next().copy()
          nextKey = rKeyProj(nextRow).copy()
          nextTime = timeOf(rTimeProj, nextRow, "right")
        } else { nextRow = null; nextKey = null }
      advanceRight()

      var candRow: InternalRow = null
      var candTime = 0L
      var candKey: InternalRow = null

      lIt.map { lRow =>
        val k = lKeyProj(lRow)
        val t = timeOf(lTimeProj, lRow, "left")
        // entering a new left key group: drop the stale candidate
        if (candKey != null && keyOrd.compare(candKey, k) != 0) {
          candRow = null; candKey = null
        }
        // skip right groups with smaller keys (no left rows want them)
        while (nextRow != null && keyOrd.compare(nextKey, k) < 0) advanceRight()
        // absorb right rows of THIS key up to the left time
        while (nextRow != null && keyOrd.compare(nextKey, k) == 0 && nextTime <= t) {
          candRow = nextRow; candTime = nextTime; candKey = nextKey
          advanceRight()
        }
        // backward candidate: latest right time <= t (absorbed above);
        // forward candidate: the == t row if one was absorbed (unique
        // (key, time) on the right), else the unconsumed peek of this key
        val backOk = candRow != null && tol.forall(d => t - candTime <= d)
        val fwdRow =
          if (candRow != null && candTime == t) candRow
          else if (nextRow != null && keyOrd.compare(nextKey, k) == 0) nextRow
          else null
        val fwdDist =
          if (fwdRow == null) Long.MaxValue
          else if (fwdRow eq candRow) 0L else nextTime - t
        val fwdOk = fwdRow != null && tol.forall(fwdDist <= _)
        val pick = dir match {
          case "backward" => if (backOk) candRow else null
          case "forward" => if (fwdOk) fwdRow else null
          case _ => // nearest: closer side wins, tie -> backward
            if (backOk && (!fwdOk || t - candTime <= fwdDist)) candRow
            else if (fwdOk) fwdRow else null
        }
        resultProj(joined(lRow, if (pick != null) pick else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Broadcast variant — the feature-store shape at scale: the versioned
  * dimension is usually key-cardinality-sized (fits a broadcast) while
  * the fact side is the 100 TB table. [[AsOfJoinExec]] pays two key-hash
  * exchanges plus two sorts to set up its streaming merge; this exec
  * broadcasts the dimension instead, builds a per-key time-sorted index
  * once per task, and answers each fact row with one hash lookup + one
  * binary search — the fact side keeps its partitioning AND ordering
  * (both reported through `outputPartitioning`/`outputOrdering`, so a
  * downstream groupBy on a pre-hashed fact column still skips its
  * exchange). Nothing about the 100 TB side moves.
  *
  * Index cost is O(|dim| log |dim|) per task — same regime as
  * BroadcastHashJoin's per-task HashedRelation deserialization and
  * irrelevant when the dim fits a broadcast by assumption. Same
  * semantics as the merge exec: backward/forward/nearest, tolerance,
  * LEFT OUTER, unique (key, time) expected on the right.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceUs: Option[Long], direction: String,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution,
    org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
      org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode))

  // the whole point: the fact side's layout survives the operator
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceUs
    val dir = direction
    val outAttrs = output
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIt =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      // key -> time-ascending (times, rows); UnsafeRow keys from both
      // sides share the key schema, so binary equality = value equality
      // (null keys match like groupBy, as in the merge exec)
      val index = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]()
      locally {
        val groups = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
        bc.value.foreach { row0 =>
          val row = row0.copy()
          val t = rTimeProj(row)
          if (t.isNullAt(0)) throw new IllegalArgumentException(
            "as-of join: NULL right-side time value; filter nulls out or " +
            "use a non-nullable time expression (e.g. coalesce to a sentinel)")
          val k = rKeyProj(row).copy()
          var buf = groups.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            groups.put(k, buf)
          }
          buf += ((t.getLong(0), row))
        }
        groups.forEach { (k, buf) =>
          val sorted = buf.sortBy(_._1)
          index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
      }
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      lIt.map { lRow =>
        val tRow = lTimeProj(lRow)
        if (tRow.isNullAt(0)) throw new IllegalArgumentException(
          "as-of join: NULL left-side time value; filter nulls out or " +
          "use a non-nullable time expression (e.g. coalesce to a sentinel)")
        val t = tRow.getLong(0)
        val entry = index.get(lKeyProj(lRow))
        var pick: InternalRow = null
        if (entry != null) {
          val (times, rows) = entry
          // bi = rightmost index with times(bi) <= t (backward candidate)
          var lo = 0; var hi = times.length - 1; var bi = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (times(mid) <= t) { bi = mid; lo = mid + 1 } else hi = mid - 1
          }
          val fi = bi + 1 // earliest index with times(fi) >= t, unless bi hit t exactly
          val backOk = bi >= 0 && tol.forall(d => t - times(bi) <= d)
          val fwdIdx = if (bi >= 0 && times(bi) == t) bi
                       else if (fi < times.length) fi else -1
          val fwdDist = if (fwdIdx < 0) Long.MaxValue else times(fwdIdx) - t
          val fwdOk = fwdIdx >= 0 && tol.forall(fwdDist <= _)
          pick = dir match {
            case "backward" => if (backOk) rows(bi) else null
            case "forward" => if (fwdOk) rows(fwdIdx) else null
            case _ => // nearest: closer side wins, tie -> backward
              if (backOk && (!fwdOk || t - times(bi) <= fwdDist)) rows(bi)
              else if (fwdOk) rows(fwdIdx) else null
          }
        }
        resultProj(joined(lRow, if (pick != null) pick else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): BroadcastAsOfJoinExec = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tol, d, l, r, bcast) =>
      if (bcast)
        BroadcastAsOfJoinExec(lk, rk, lt, rt, tol, d, planLater(l), planLater(r)) :: Nil
      else
        AsOfJoinExec(lk, rk, lt, rt, tol, d, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Column API ([[TopKPerKey.topKPerKey]] conventions: analyzed
    * expressions are harvested from throwaway plans; the strategy
    * installs on first use). The right side is re-aliased through a
    * fresh projection so self-joins (dim derived from the fact table)
    * never share expression ids. Rename clashing columns beforehand —
    * the output concatenates both sides' schemas as-is. */
  /** Valid `direction` values — pandas merge_asof parity: `backward`
    * (latest right time <= t), `forward` (earliest right time >= t),
    * `nearest` (closer of the two, tie -> backward). */
  val Directions: Set[String] = Set("backward", "forward", "nearest")

  /** `broadcast = true` plans [[BroadcastAsOfJoinExec]]: the dimension
    * broadcasts and the fact side keeps its partitioning and ordering —
    * zero exchanges, zero sorts on the big side. Use when the dim fits
    * the broadcast budget (the usual feature-store case); the default
    * merge exec handles dim sides too big to broadcast. */
  def asOfJoin(leftDf: DataFrame, rightDf: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column,
      toleranceUs: Option[Long] = None,
      direction: String = "backward",
      broadcast: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import org.apache.spark.sql.functions.col
    val spark = leftDf.sparkSession
    Bridge.addStrategy(spark, AsOfJoinStrategy)
    // fresh expression ids on the right (self-join safety)
    val rFresh = rightDf.select(rightDf.columns.map(c => col(c).as(c)).toSeq: _*)
    def harvest(df: DataFrame, cols: Seq[Column]): (Seq[Expression], LogicalPlan) = {
      val Project(projectList, child) =
        df.select(cols: _*).queryExecution.analyzed: @unchecked
      (projectList.map { case a: Alias => a.child; case e => e }, child)
    }
    val (lk :+ lt, lPlan) = harvest(leftDf, leftKeys :+ leftTime): @unchecked
    val (rk :+ rt, rPlan) = harvest(rFresh, rightKeys :+ rightTime): @unchecked
    Bridge.ofRows(spark,
      AsOfJoin(lk, rk, lt, rt, toleranceUs, direction, lPlan, rPlan, broadcast))
  }
}
