package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: prefix `levenshtein(a, b) <= k` filters with a cheap
  * length-difference guard.
  *
  * Edit distance is bounded below by the length difference —
  * |len(a) - len(b)| > k implies levenshtein(a, b) > k — so the guard
  * short-circuits the O(len²) dynamic program for every pair whose
  * lengths already rule it out. In a near-dup verification stage
  * (candidates from q30/q71 filtered by edit distance) most candidate
  * pairs in a skewed corpus fail on length alone; at 100 TB the guard
  * is the difference between a scan-speed filter and a compute-bound
  * one. The conjunct order matters: Spark evaluates `And` left-to-right,
  * and predicate evaluation short-circuits, so the O(1) guard runs
  * first.
  *
  * Rewrites `lev <= k`, `lev < k`, and the mirrored `k >= lev` /
  * `k > lev` forms when `k` is foldable. The rule runs inside the
  * operator-optimization fixed point, so it must be idempotent: a
  * filter that already contains a guard conjunct for the same
  * comparison is left alone.
  */
object LevenshteinGuard extends Rule[LogicalPlan] {

  private def lenDiffGuard(a: Expression, b: Expression,
      bound: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), bound)

  /** Is `cmp` a levenshtein-vs-foldable-bound comparison? Returns the
    * (a, b, bound) triple used to build the guard. */
  private def levBound(cmp: Expression)
      : Option[(Expression, Expression, Expression)] = cmp match {
    case LessThanOrEqual(Levenshtein(a, b, _), k) if k.foldable =>
      Some((a, b, k))
    case LessThan(Levenshtein(a, b, _), k) if k.foldable => Some((a, b, k))
    case GreaterThanOrEqual(k, Levenshtein(a, b, _)) if k.foldable =>
      Some((a, b, k))
    case GreaterThan(k, Levenshtein(a, b, _)) if k.foldable =>
      Some((a, b, k))
    case _ => None
  }

  private def alreadyGuarded(cond: Expression): Boolean =
    cond.exists {
      case And(g, cmp) =>
        levBound(cmp).exists { case (a, b, k) =>
          g.semanticEquals(lenDiffGuard(a, b, k))
        }
      case _ => false
    }

  /** Rewrite boolean structure only — never descend into non-boolean
    * expressions, where a rewrite could change value semantics. */
  private def guard(e: Expression): Expression = e match {
    case And(l, r) => And(guard(l), guard(r))
    case Or(l, r) => Or(guard(l), guard(r))
    case Not(c) => Not(guard(c))
    case cmp =>
      levBound(cmp) match {
        case Some((a, b, k)) => And(lenDiffGuard(a, b, k), cmp)
        case None => cmp
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !alreadyGuarded(cond) =>
      val guarded = guard(cond)
      if (guarded.fastEquals(cond)) f else Filter(guarded, child)
  }
}
