package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule rewriting KEYLESS range joins — the shape Spark can
  * only plan as a cartesian / broadcast-nested-loop —
  *
  * {{{ left JOIN right ON l_lo <= r_hi AND r_lo <= l_hi [AND rest…] }}}
  *
  * into the bin-replicated equi-join ([[graft.core.Ops.intervalOverlapJoin]]'s
  * shape, the standard interval-binning trick): each side explodes its
  * interval into fixed-width bins, the join runs as a plain shuffled
  * equi-join on the bin, the ORIGINAL condition re-applies exactly, and
  * a first-shared-bin conjunct keeps each qualifying pair exactly once.
  * An O(|L|·|R|) nested loop becomes O((|L|+|R|)·f) shuffled rows with
  * per-bucket joins, where f = avg interval length / bin width — the
  * difference between a job that finishes and one that doesn't at
  * 100 TB.
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.binWidth` is set to a
  * positive long in the UNITS OF THE RANGE COLUMNS (e.g. microseconds);
  * the right width is data-dependent (≈ the typical interval length),
  * which is why this is a conf and not a default.
  *
  * Guards (each one load-bearing):
  *   - inner joins only (null-emission semantics of outer joins don't
  *     survive the bin replication);
  *   - fires only when NO equi-conjunct joins the two sides — with an
  *     equality present Spark already hash-partitions and the range
  *     conjuncts are cheap secondary filters;
  *   - needs one `leftExpr <= rightExpr` and one `rightExpr <= leftExpr`
  *     conjunct (any of <, <=, >, >= — normalized), both sides integral
  *     and deterministic; everything else is left untouched;
  *   - completeness holds even for DEGENERATE rows (lo > hi): the bin
  *     span covers [least(lo,hi), greatest(lo,hi)], and the two range
  *     conjuncts force the covers to intersect — if cover(L) ended
  *     before cover(R) began, `r_lo <= l_hi <= max(L) < min(R) <= r_lo`
  *     would be a contradiction (symmetrically for the other order), so
  *     every qualifying pair shares the bin of
  *     `greatest(least-of-L, least-of-R)` and the dedup conjunct keeps
  *     exactly that copy.
  *
  * The rewritten join carries a bin equality, so the rule never matches
  * its own output (idempotent under the optimizer's fixed point).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.binWidth"

  /** Normalize a comparison conjunct to (smaller, larger, fromLeftFirst):
    * returns (a, b) meaning the conjunct implies a <= b. */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  private def evaluableOn(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && integral(e) && canEvaluate(e, side)

  /** One exploded-bin child: `child` + generated `__bin` column covering
    * [least(lo,hi) div w, greatest(lo,hi) div w]. */
  private def binned(child: LogicalPlan, lo: Expression, hi: Expression,
      w: Long, name: String): (LogicalPlan, Attribute, Expression) = {
    val (loL, hiL) = (Cast(lo, LongType), Cast(hi, LongType))
    // truncating `div` is fine here: it is monotone, so the id span
    // [first, last] covers every bucket a point of [lo, hi] maps to
    val first = new IntegralDivide(Least(Seq(loL, hiL)), Literal(w))
    val last = new IntegralDivide(Greatest(Seq(loL, hiL)), Literal(w))
    // Sequence is TimeZoneAwareExpression: a None zone is UNRESOLVED
    // after analysis (ResolveTimeZone has already run), so pin the
    // session zone even though integral sequences never consult it
    val gen = Explode(Sequence(first, last, Some(Literal(1L)),
      Some(conf.sessionLocalTimeZone)))
    val binAttr = AttributeReference(name, LongType,
      nullable = gen.elementSchema.head.nullable)()
    (Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binAttr), child = child),
      binAttr,
      first) // the side's FIRST bin (for the dedup conjunct)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wStr = conf.getConfString(ConfKey, "")
    if (wStr.isEmpty) return plan
    val w = wStr.toLong
    require(w > 0, s"$ConfKey must be a positive long, got $w")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) if j.resolved =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (canEvaluate(a, left) && canEvaluate(b, right)) ||
              (canEvaluate(b, left) && canEvaluate(a, right))
          case EqualNullSafe(a, b) =>
            (canEvaluate(a, left) && canEvaluate(b, right)) ||
              (canEvaluate(b, left) && canEvaluate(a, right))
          case _ => false
        }
        if (hasEqui) j
        else {
          // one conjunct bounding a left expr by a right expr, and one
          // the other way: together they pin intersecting bin covers
          val les = conjuncts.flatMap(asLe)
          val lr = les.find { case (a, b) =>
            evaluableOn(a, left) && evaluableOn(b, right) }
          val rl = les.find { case (a, b) =>
            evaluableOn(a, right) && evaluableOn(b, left) }
          (lr, rl) match {
            case (Some((lLo, rHi)), Some((rLo, lHi))) =>
              val (lG, lBin, lFirst) = binned(left, lLo, lHi, w, "__bin_l")
              val (rG, rBin, rFirst) = binned(right, rLo, rHi, w, "__bin_r")
              val dedup = EqualTo(lBin, Greatest(Seq(lFirst, rFirst)))
              val newCond = And(EqualTo(lBin, rBin), And(cond, dedup))
              Project(j.output,
                Join(lG, rG, Inner, Some(newCond), JoinHint.NONE))
            case _ => j
          }
        }
    }
  }
}
