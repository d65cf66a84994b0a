package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
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
  * Semantics: identical when the window ordering is total (the same
  * caveat the window formulation itself carries — with ties, which rows
  * row_number keeps is already sort-stability-dependent). Conditions
  * handled: `rn <= k`, `rn < k`, `rn = 1`. Multi-expression windows,
  * rank()/dense_rank(), non-default frames, and plans that keep the
  * rank column are left untouched. Disable with
  * `spark.graft.topkRewrite.enabled=false`.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topkRewrite.enabled"

  /** The single row_number window expression's output id, if this
    * Window node is exactly the rn-idiom. */
  private def rnOf(w: Window): Option[ExprId] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame,
          UnboundedPreceding, CurrentRow))), _)) =>
      Some(a.exprId)
    case _ => None
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
          rn <- rnOf(w)
          k <- limitOf(cond, rn)
          if k >= 1 && projList.forall(!_.references.exists(_.exprId == rn))
        } yield Project(projList,
          TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child))
        ).getOrElse(p)
    }
}
