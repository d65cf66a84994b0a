package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.functions.DeletionNeighborhood

/** Optimizer rule rewriting edit-distance joins — the shape Spark can
  * only plan as a broadcast-nested-loop / cartesian —
  *
  * {{{ left JOIN right ON levenshtein(a, b) <= k [AND rest…] }}}
  *
  * into the FastSS deletion-neighborhood blocked join
  * ([[graft.pipeline.FuzzyMatch]]'s shape): the DISTINCT values of each
  * side's key expression explode into their ≤k-deletion variants
  * ([[DeletionNeighborhood]]), candidates form as a plain shuffled
  * equi-join on the variant (lossless: strings within Levenshtein k
  * ALWAYS share a variant), a per-distinct-pair verify re-applies the
  * exact distance, and the verified (value, value) pair set joins back
  * to both original inputs — so row MULTIPLICITY is exactly the
  * original join's, duplicates in the inputs included. An O(|L|·|R|)
  * nested loop over every row pair becomes O(distinct values · |s|^k)
  * exploded keys plus two hash joins — the difference between a fuzzy
  * join that finishes and one that doesn't on a billion-name catalog.
  *
  * OPT-IN via `spark.graft.fuzzyJoin.enabled=true`: the |s|^k key
  * fan-out is only a win when the join columns are short strings
  * (names, titles, codes) — on document-length strings the blocking
  * index dwarfs the input, a data property a rule cannot see. Same
  * policy as [[RangeJoinRewrite]]'s bin width.
  *
  * Guards (each load-bearing):
  *   - inner joins only; condition must carry `levenshtein(a,b) <= k`
  *     (or an equivalent normalized comparison) with literal k in [1,3],
  *     both sides deterministic STRING expressions, one evaluable per
  *     side (levenshtein is symmetric, either orientation works);
  *   - fires only when NO equi-conjunct joins the two sides — with an
  *     equality Spark already hash-partitions and the distance is a
  *     cheap secondary filter;
  *   - the rewritten joins all carry equalities, so the rule never
  *     matches its own output (idempotent under the fixed point);
  *   - the ORIGINAL condition re-applies on the final join: every other
  *     conjunct (e.g. `a.n < b.n`) keeps its exact semantics, and NULL
  *     keys drop out exactly as they would from the original predicate.
  */
object FuzzyJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.fuzzyJoin.enabled"

  /** Normalize a conjunct to (a, b, k) meaning levenshtein(a,b) <= k.
    * Only the plain two-argument levenshtein participates (the
    * thresholded form already early-outs internally). */
  private def asLevLe(e: Expression): Option[(Expression, Expression, Int)] =
    e match {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
        Some((a, b, k))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
        Some((a, b, k))
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) =>
        Some((a, b, k - 1))
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) =>
        Some((a, b, k - 1))
      case _ => None
    }

  private def stringDet(e: Expression): Boolean =
    e.dataType == StringType && e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false") != "true") return plan
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
          val hit = conjuncts.flatMap(asLevLe).collectFirst {
            case (a, b, k) if k >= 1 && k <= 3 &&
                stringDet(a) && stringDet(b) &&
                ((canEvaluate(a, left) && canEvaluate(b, right)) ||
                  (canEvaluate(a, right) && canEvaluate(b, left))) =>
              // orient (levenshtein is symmetric) — by the FULL matched
              // combination, not the first side alone: an attribute-free
              // `a` (a literal/constant expr) evaluates on BOTH sides,
              // so `canEvaluate(a, left)` alone could pair it with a
              // left-only `b` and build bDist over the wrong child
              if (canEvaluate(a, left) && canEvaluate(b, right)) (a, b, k)
              else (b, a, k)
          }
          hit.map { case (a, b, k) => rewrite(j, left, right, a, b, k) }
            .getOrElse(j)
        }
    }
  }

  /** The blocked-join plan; see class doc for the multiplicity argument:
    * `cand` holds each qualifying (value_a, value_b) pair EXACTLY once,
    * so re-joining it to both inputs reproduces the original join's
    * output multiset. */
  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      a: Expression, b: Expression, k: Int): LogicalPlan = {
    val aAl = Alias(a, "__fz_a")()
    val bAl = Alias(b, "__fz_b")()
    val aAttr = aAl.toAttribute
    val bAttr = bAl.toAttribute
    val aDist = Aggregate(Seq(aAttr), Seq(aAttr), Project(Seq(aAl), left))
    val bDist = Aggregate(Seq(bAttr), Seq(bAttr), Project(Seq(bAl), right))

    def keyed(child: LogicalPlan, attr: Attribute, name: String)
        : (LogicalPlan, Attribute) = {
      val gen = Explode(DeletionNeighborhood(attr, k))
      val keyAttr = AttributeReference(name, StringType,
        nullable = gen.elementSchema.head.nullable)()
      (Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(keyAttr), child = child),
        keyAttr)
    }
    val (aKeyed, aKey) = keyed(aDist, aAttr, "__fz_ka")
    val (bKeyed, bKey) = keyed(bDist, bAttr, "__fz_kb")

    val candDup = Project(Seq(aAttr, bAttr),
      Join(aKeyed, bKeyed, Inner, Some(EqualTo(aKey, bKey)), JoinHint.NONE))
    val cand = Aggregate(Seq(aAttr, bAttr), Seq(aAttr, bAttr), candDup)
    val verified = Filter(
      LessThanOrEqual(Levenshtein(aAttr, bAttr, None), Literal(k)), cand)

    val j1 = Join(left, verified, Inner,
      Some(EqualTo(a, aAttr)), JoinHint.NONE)
    val j2 = Join(j1, right, Inner,
      Some(And(EqualTo(b, bAttr), j.condition.get)), JoinHint.NONE)
    Project(j.output, j2)
  }
}
