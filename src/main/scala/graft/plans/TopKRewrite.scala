package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule rewriting the window-top-k idiom
  *
  * {{{ Project(p, Filter(rn <= k, Window(rn := row_number() over (partition K order O), child))) }}}
  *
  * into the engine's [[TopKPerKey]] operator whenever the rank column is
  * consumed ONLY by the filter. The window formulation fully sorts every
  * partition and shuffles the whole input (even with Spark's own
  * WindowGroupLimit pre-filter, the Window + its sort remain); the
  * custom operator keeps bounded map-side heaps so only ≤ k rows per
  * (key, input-partition) cross the exchange — measured 3.5× on the
  * bench topk extras at sf0.1.
  *
  * Shapes handled:
  *   - conditions `rn <= k`, `rn < k`, `rn = 1`, including as ONE
  *     conjunct of a compound filter — the remaining conjuncts are
  *     re-applied AFTER the top-k (sound: the window ranks over all
  *     child rows, so post-filtering commutes with the rank filter);
  *   - empty `PARTITION BY` (global top-k) → `Limit(k, Sort)`, which
  *     Spark plans as TakeOrderedAndProject (bounded per-partition
  *     heaps, one k-row exchange) — TopKPerKey's ClusteredDistribution
  *     is undefined for zero keys, and the limit plan is better anyway;
  *   - `rank()` / `dense_rank()` ONLY when the window order is provably
  *     total, i.e. the (partition ++ order) expressions cover one of the
  *     child's propagated `distinctKeys` sets (e.g. ordering by the
  *     grouping keys of an Aggregate) — with a unique order all three
  *     rank functions coincide. Non-unique orders never rewrite: rank
  *     keeps ties, row_number does not.
  *
  * Multi-expression windows, non-default frames for row_number, and
  * plans that keep the rank column are left untouched. Disable with
  * `spark.graft.topkRewrite.enabled=false`.
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.topkRewrite.enabled"

  /** The single rank-like window expression's output id, if this Window
    * node is the rn-idiom. Second element: true when the function is
    * rank()/dense_rank() and therefore needs a provably-unique order. */
  private def rnOf(w: Window): Option[(ExprId, Boolean)] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(fn, WindowSpecDefinition(_, _, frame)), _)) =>
      fn match {
        case _: RowNumber if frame == SpecifiedWindowFrame(RowFrame,
            UnboundedPreceding, CurrentRow) => Some((a.exprId, false))
        // rank/dense_rank ignore their frame (analyzer pins a required
        // one); value depends only on the order expressions
        case _: Rank | _: DenseRank => Some((a.exprId, true))
        case _ => None
      }
    case _ => None
  }

  /** True iff rows within a window partition provably have distinct
    * order tuples: the (partition ++ order) expressions cover one of the
    * child's `distinctKeys` sets (propagated by Catalyst for Aggregate
    * grouping keys, Distinct, etc.). Within a partition the partition
    * expressions are constant, so tuple-uniqueness over the union set
    * implies order-uniqueness inside each partition. */
  private def orderIsUnique(w: Window): Boolean = {
    val covering = ExpressionSet(w.partitionSpec ++ w.orderSpec.map(_.child))
    w.child.distinctKeys.exists(_.subsetOf(covering))
  }

  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n))
      if a.exprId == rn => Some(n)
    case LessThan(a: AttributeReference, IntegerLiteral(n))
      if a.exprId == rn => Some(n - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1))
      if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformUp {
      case p @ Project(projList, Filter(cond, w: Window))
          if w.orderSpec.nonEmpty =>
        (for {
          (rn, needsUnique) <- rnOf(w)
          if !needsUnique || orderIsUnique(w)
          (rnConds, rest) = splitConjunctivePredicates(cond)
            .partition(_.references.exists(_.exprId == rn))
          k <- rnConds match {
            case Seq(only) => limitOf(only, rn)
            case _ => None // zero or several rank conjuncts: leave alone
          }
          if k >= 1 && projList.forall(!_.references.exists(_.exprId == rn))
        } yield {
          val topk =
            if (w.partitionSpec.isEmpty)
              Limit(Literal(k), Sort(w.orderSpec, global = true, w.child))
            else TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child)
          // residual conjuncts reference only child columns (they don't
          // touch rn and Window outputs child.output ++ rn)
          Project(projList,
            rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
        }).getOrElse(p)
    }
}
