package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And,
  AttributeReference, Cast, EqualNullSafe, EqualTo, Explode, Expression,
  GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan,
  LessThanOrEqual, Literal, Pmod, PredicateHelper, Sequence, Subtract,
  UnixMicros}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate,
  Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType,
  LongType, ShortType, TimestampType}

/** Optimizer rule: automatic range-join binning. An INNER join whose
  * condition bounds one side's point expression between two expressions
  * of the other side —
  *
  *   p.t >  i.lo  AND  p.t <= i.hi      (any >/>= with any </<=)
  *
  * — and carries NO equi-join conjunct is the one join shape Spark can
  * only plan as a nested-loop (BroadcastNestedLoopJoin, or a
  * CartesianProduct when neither side broadcasts): there is no key to
  * shuffle or sort on. The engine already ships the manual fix as
  * q_join_range_binned (SURVEY.md §4.2(c) / E3): bin both sides to a
  * fixed width, equi-join on the bin, refine with the exact predicate.
  * This rule performs that rewrite IN THE OPTIMIZER, so a user who
  * writes the naive interval join gets the scalable plan without
  * knowing the trick — the same design as the published range-join
  * binning optimizations in Databricks Runtime and the interval-join
  * operator every streaming engine ships:
  *
  *   point side     → project an extra column  bin(t)
  *   interval side  → filter lo ≤ hi (implied by the original
  *                    predicate, so semantics-preserving on an inner
  *                    join), then explode sequence(bin(lo), bin(hi))
  *   new join       → equi on the bin columns AND the ORIGINAL
  *                    condition as residual refinement
  *   outer project  → back to the original join output
  *
  * Each qualifying pair matches in EXACTLY one bin — the point's own —
  * because the point contributes one bin and the interval's explode
  * emits each bin once, so no dedup pass is needed and the residual
  * predicate restores exactness (strict vs inclusive bounds, ties,
  * everything). Unmatched-null behavior is unchanged: a NULL point or
  * bound made the original conjunct NULL (row dropped by the inner
  * join) and here yields a NULL bin / filtered build row.
  *
  * Bin width comes from `spark.graft.rangeJoin.bin` (seconds for
  * TimestampType, column units for integrals; ≤ 0 disables; default
  * 3600). Width choice is a fan-out/selectivity tradeoff exactly as in
  * the published designs: the explode emits (hi−lo)/W + 1 rows per
  * interval, so W should be on the order of the typical interval span.
  *
  * At 100 TB: the rewrite turns an O(|L|·|R|) nested loop into one
  * shuffle on a dense integer key. Skewed bins (a hot hour) are plain
  * join skew, which AQE's skew-join split already handles — the reason
  * the rewrite targets the optimizer and not a bespoke physical node.
  *
  * Scope guards, each load-bearing:
  *  - inner joins only (outer variants would need null-extension
  *    bookkeeping the residual-refine shape cannot express);
  *  - any existing cross-side equi conjunct disables the rewrite —
  *    Catalyst already plans SMJ/SHJ on that key and binning would
  *    only add explode fan-out (q_join_range, the funnel family);
  *  - point and bounds must be deterministic, reference exactly one
  *    side each, and be all-timestamp or all-integral;
  *  - idempotent by construction: the rewritten join HAS an equi
  *    conjunct (the bins), so the fixpoint batch's next pass skips it.
  *
  * The (c) rung of SURVEY.md §4.2's custom-machinery ladder beside
  * [[VecDotRewrite]] and [[EditDistPrefilter]]: no DataFrame-level API
  * can restructure someone else's already-composed join. Gated by
  * E273 q_join_range_auto (oracle runs the naive SQL), a PlanSuite
  * lock (bin equi-join present, no BNLJ; control run with the conf
  * off nested-loops), and an OperatorSuite rule-on/off equivalence. */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "spark.graft.rangeJoin.bin"

  private def binSize: Long =
    try conf.getConfString(BinConf, "3600").trim.toLong
    catch { case _: NumberFormatException => 0L }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** epoch-micros for timestamps (the internal unit, so exact);
    * widened long for integrals. */
  private def asLong(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case LongType => e
    case _ => Cast(e, LongType)
  }

  /** floor(v / w) via the non-negative remainder — IntegralDivide
    * truncates toward zero, so subtract pmod first; the identity
    * q_join_range_binned uses, and exact for pre-epoch values too. */
  private def floorBin(e: Expression, w: Long): Expression = {
    val v = asLong(e)
    val lw = Literal(w)
    new IntegralDivide(new Subtract(v, new Pmod(v, lw)), lw)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = binSize
    if (bin <= 0) return plan
    plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, bin).getOrElse(j)
    }
  }

  /** 1 = references only left, 2 = only right, 0 = neither/both. */
  private def sideOf(e: Expression, j: Join): Int =
    if (e.references.isEmpty) 0
    else if (e.references.subsetOf(j.left.outputSet)) 1
    else if (e.references.subsetOf(j.right.outputSet)) 2
    else 0

  /** A candidate bound, normalized to "point-expression t is bounded
    * by `bound` from the other side". */
  private case class Bound(t: Expression, bound: Expression,
      tSide: Int, isLower: Boolean)

  private def rewrite(j: Join, cond: Expression,
      bin: Long): Option[LogicalPlan] = {
    val conjs = splitConjunctivePredicates(cond)

    val crossEqui = conjs.exists {
      case EqualTo(a, b) => sidesOppose(a, b, j)
      case EqualNullSafe(a, b) => sidesOppose(a, b, j)
      case _ => false
    }
    if (crossEqui) return None

    // a >= b is a lower bound on a AND an upper bound on b — emit both
    // views; the pairing below keeps whichever t has both bounds
    def norm(a: Expression, b: Expression,
        aIsLower: Boolean): Seq[Bound] = {
      val (sa, sb) = (sideOf(a, j), sideOf(b, j))
      if (sa == 0 || sb == 0 || sa == sb) return Nil
      if (!a.deterministic || !b.deterministic) return Nil
      def ok(e: Expression) =
        e.dataType == TimestampType || isIntegral(e.dataType)
      if (!ok(a) || !ok(b)) return Nil
      if ((a.dataType == TimestampType) != (b.dataType == TimestampType))
        return Nil
      Seq(Bound(a, b, sa, aIsLower), Bound(b, a, sb, !aIsLower))
    }

    val bounds = conjs.flatMap {
      case GreaterThanOrEqual(a, b) => norm(a, b, aIsLower = true)
      case GreaterThan(a, b) => norm(a, b, aIsLower = true)
      case LessThanOrEqual(a, b) => norm(a, b, aIsLower = false)
      case LessThan(a, b) => norm(a, b, aIsLower = false)
      case _ => Nil
    }

    val pair = (for {
      lo <- bounds if lo.isLower
      hi <- bounds if !hi.isLower
      if lo.tSide == hi.tSide && lo.t.semanticEquals(hi.t)
    } yield (lo, hi)).headOption

    pair.map { case (lo, hi) =>
      val t = lo.t
      val w = if (t.dataType == TimestampType) bin * 1000000L else bin
      val (pointPlan, intervalPlan) =
        if (lo.tSide == 1) (j.left, j.right) else (j.right, j.left)

      val binAlias = Alias(floorBin(t, w), "graft_rj_bin_p")()
      val newPoint = Project(pointPlan.output :+ binAlias, pointPlan)

      // lo ≤ hi is implied by the original predicate (t ≥ lo ∧ t ≤ hi
      // ⇒ lo ≤ hi), so the guard drops only rows that could never
      // match — and keeps the sequence ascending (Sequence DESCENDS
      // for start > stop, which would fabricate bins)
      val guard = Filter(
        LessThanOrEqual(asLong(lo.bound), asLong(hi.bound)), intervalPlan)
      val seq = Sequence(floorBin(lo.bound, w), floorBin(hi.bound, w),
        Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
      val genOut =
        AttributeReference("graft_rj_bin_i", LongType, nullable = false)()
      val newInterval =
        Generate(Explode(seq), Nil, outer = false, None, Seq(genOut), guard)

      val (newLeft, newRight, binL, binR) =
        if (lo.tSide == 1)
          (newPoint, newInterval, binAlias.toAttribute, genOut)
        else
          (newInterval, newPoint, genOut, binAlias.toAttribute)
      Project(j.output,
        Join(newLeft, newRight, Inner,
          Some(And(EqualTo(binL, binR), cond)), j.hint))
    }
  }

  private def sidesOppose(a: Expression, b: Expression, j: Join): Boolean = {
    val (sa, sb) = (sideOf(a, j), sideOf(b, j))
    (sa == 1 && sb == 2) || (sa == 2 && sb == 1)
  }
}
