package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThanOrEqual, Length, LessThan, LessThanOrEqual, Levenshtein,
  Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: similarity-threshold prefiltering. A conjunct
  *
  *   levenshtein(a, b) <= k        (or < k, or the commuted k >= form)
  *
  * implies the far cheaper `abs(length(a) - length(b)) <= k` — edit
  * distance is bounded below by the length difference, because each
  * edit changes the length by at most one. This rule injects that
  * implied conjunct, so rows whose lengths already disagree by more
  * than the threshold never reach the O(|a|·|b|) DP — the standard
  * first move of every similarity-join engine, done here where it
  * belongs: in the optimizer, once, for every query, instead of by
  * hand in each one. Semantics-preserving by construction (the added
  * predicate is implied by the existing one), so the DuckDB oracle
  * runs the ORIGINAL predicate and must agree.
  *
  * Fixpoint discipline: injected rules run inside the operator-
  * optimization fixed-point batch, so the rule must be idempotent —
  * it skips any filter that already contains the implied conjunct
  * (semanticEquals), reaching a fixpoint after one effective pass.
  * The (c) rung of SURVEY.md §4.2 beside [[VecDotRewrite]]: no
  * DataFrame-level API can rewrite someone else's already-composed
  * predicate. */
object EditDistPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** length(e), PRE-FOLDED for foldable inputs: constant folding will
    * turn `length('probe')` into its literal anyway, and if this rule
    * constructed the unfolded form its idempotence guard would never
    * match the folded conjunct already in the plan — the rule would
    * re-inject every fixpoint pass (observed before this fold). */
  private def len(e: Expression): Expression =
    if (e.foldable) e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Literal(s.numChars(), IntegerType)
      case _ => Length(e)
    } else Length(e)

  /** The cheap implied conjunct for a supported threshold shape. */
  private def implied(c: Expression): Option[Expression] = c match {
    case LessThanOrEqual(Levenshtein(a, b, _), k @ Literal(_, IntegerType)) =>
      Some(LessThanOrEqual(Abs(Subtract(len(a), len(b))), k))
    case LessThan(Levenshtein(a, b, _), k @ Literal(_, IntegerType)) =>
      Some(LessThan(Abs(Subtract(len(a), len(b))), k))
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), Levenshtein(a, b, _)) =>
      Some(LessThanOrEqual(Abs(Subtract(len(a), len(b))), k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val adds = conjuncts.flatMap(implied)
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (adds.isEmpty) f
      else Filter((conjuncts ++ adds).reduce(And), child)
  }
}
