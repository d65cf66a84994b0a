package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan traversal that sees through AQE wrappers.
  * `AdaptiveSparkPlanExec` and `QueryStageExec` both hide their subtree
  * outside `children` (a naive `plan.exists`/`collect` is silently
  * vacuous under AQE) — every plan inspection in the engine and its
  * specs goes through this ONE walker so the next Spark upgrade only
  * has one place to adjust. */
object PlanWalk {

  /** All nodes of `p` in pre-order, descending through adaptive
    * wrappers and materialized query stages. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  def exists(p: SparkPlan)(pred: SparkPlan => Boolean): Boolean =
    nodes(p).exists(pred)
}
