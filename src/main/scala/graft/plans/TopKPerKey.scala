package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Per-key top-k as a first-class operator — the reference's
  * per-proc-top-k idiom (`/root/reference/oink/wordfreq.cpp:65-82`: each
  * proc keeps 10 rows, then gather + final sort) promoted to a Catalyst
  * operator pair, because the built-in formulation
  * (`row_number().over(Window.partitionBy(k).orderBy(o)) <= k`) must
  * fully SORT every partition: O(n log n) and the whole input crosses
  * the shuffle. This operator keeps a bounded heap per key on the map
  * side, so only ≤ k rows per (key, input-partition) reach the exchange
  * — at 100 TB that is the difference between shuffling the corpus and
  * shuffling k·|keys| rows.
  *
  * Planning: the logical node expands to Partial → Exchange → Final
  * exactly like hash aggregation; EnsureRequirements inserts the
  * exchange from the Final node's ClusteredDistribution requirement.
  * Results match the window formulation exactly when the ordering is
  * total (tie-break columns included) — asserted by TopKPerKeySpec and
  * the w_topk_custom DuckDB oracle.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Physical pair. The PARTIAL node keeps a bounded heap per key in a
  * hashmap CAPPED at `maxPartialKeys` distinct keys: once the cap is
  * hit, rows of unseen keys stream straight through (the final node
  * re-filters, so pass-through only costs shuffle volume, never
  * correctness) — memory stays ≤ maxPartialKeys·k rows under
  * adversarial key cardinality. The FINAL node is sort-based and O(1)
  * memory: it requires (keys, order) child ordering — Spark plans a
  * spillable external SortExec under it — and streams the first k rows
  * of each key group. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    maxPartialKeys: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(SortOrder(_, Ascending)) ++ order)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(SortOrder(_, Ascending)) ++ order

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  private def doExecutePartial(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val maxKeys = maxPartialKeys
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(sortOrder, childOutput)
      // per key: bounded "worst-on-top" heap of the current best k rows
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reverse = ordering.reverse // head = worst of the kept rows
      // Streaming pass: absorbed rows produce nothing now; overflow rows
      // (key cap hit) are emitted immediately, unbuffered.
      val passThrough: Iterator[InternalRow] = new Iterator[InternalRow] {
        private var pending: InternalRow = null
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val row = it.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null && heaps.size() < maxKeys) {
              heap = new java.util.PriorityQueue[InternalRow](limit + 1, reverse)
              heaps.put(key.copy(), heap)
            }
            if (heap == null) pending = row // cap reached: final re-filters
            else if (heap.size() < limit) heap.add(row.copy())
            else if (ordering.compare(row, heap.peek()) < 0) {
              heap.poll(); heap.add(row.copy())
            }
          }
        }
        override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
      import scala.jdk.CollectionConverters._
      // ++ evaluates its argument lazily — heaps flush only after the
      // input (and thus every heap update) is exhausted. No per-heap
      // sort: the final node sorts globally anyway.
      passThrough ++ heaps.values().iterator().asScala.flatMap { h =>
        h.toArray(new Array[InternalRow](h.size())).iterator
      }
    }, preservesPartitioning = true)
  }

  /** Child arrives sorted by (keys, order): emit the first k of each
    * key group, constant memory, spilling delegated to the SortExec. */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val limit = k
    child.execute().mapPartitions ({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var prevKey: UnsafeRow = null
      var emitted = 0
      it.filter { row =>
        val key = keyProj(row)
        if (prevKey == null || !key.equals(prevKey)) {
          prevKey = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= limit
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {

  /** Cap on distinct keys tracked per map-side partition (heap memory
    * ≤ cap·k rows); overflow keys stream through to the final node. */
  val MaxPartialKeysConf = "spark.graft.topk.maxPartialKeys"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val maxKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxPartialKeysConf, "131072").toInt
      TopKPerKeyExec(keys, order, k, partial = false, maxKeys,
        TopKPerKeyExec(keys, order, k, partial = true, maxKeys,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Column API: top-k rows per key by `order` (include tie-break
    * columns for a total order — determinism requires it, exactly as
    * with the window formulation). Installs the strategy on first use.
    *
    * Columns are materialized to ANALYZED catalyst expressions by
    * harvesting throwaway `sort`/`select` plans — Spark 4 Columns wrap
    * lazy ColumnNode expressions that only standard Dataset operations
    * resolve (and whose wrappers are not task-serializable). */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKStrategy)
    val Sort(order, _, child, _) =
      df.sort(orderCols: _*).queryExecution.analyzed: @unchecked
    val Project(projectList, _) =
      df.select(keyCols: _*).queryExecution.analyzed: @unchecked
    val keys = projectList.map { case a: Alias => a.child; case e => e }
    Bridge.ofRows(spark, TopKPerKey(keys, order, k, child))
  }
}
