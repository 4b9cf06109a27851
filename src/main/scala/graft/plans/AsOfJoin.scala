package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode,
  LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}

/** Whole-operator custom machinery, second instance (SURVEY.md §4.2
  * ladder rung (c), after [[TopKPerKey]]): a NATIVE as-of join.
  *
  * Semantics: LEFT OUTER AS-OF — for every probe (left) row, the
  * single build (right) row with equal key and the greatest
  * (build.time, build.tiebreak) such that build.time ≤ probe.time;
  * no qualifying build row yields nulls on the build side. Identical
  * to the tagged-union-window formulation (Relational.qJoinAsofTolerance
  * without the tolerance) provided (time, tiebreak) is a total order
  * per key on the build side.
  *
  * Why a custom operator when the window form already scales: the
  * window form must UNION the two inputs into one shuffle and carry
  * every probe column through the window sort (or re-join afterwards);
  * the native operator keeps the sides separate — each is hash-
  * clustered on its OWN key and sorted (key, time) per partition by
  * EnsureRequirements, then ONE streaming merge pass per partition
  * holds exactly one candidate row of state. No unioned shuffle, no
  * carried columns, no window buffer: O(1) state per key versus the
  * window's per-partition sort of the union, and the probe side's
  * ordering requirement (key, time) is often already satisfied by a
  * time-clustered layout (E101), in which case the probe sort
  * disappears entirely — the plan-shape win a window can never have.
  * The merge is exact under the required ordering because build rows
  * arrive in (key, time, tiebreak) order: the LAST build row admitted
  * at-or-before the probe time IS the as-of match.
  *
  * Scale/skew: the shuffle keys are the equi keys (same exchange an
  * inner equi join would pay); a hot key serializes only its own
  * merge, state stays one row, and there is no candidate-pair
  * expansion at any skew (the failure mode of the range-join
  * formulation, J6/E3's subject).
  *
  * Null semantics (documented contract, not SQL's): the merge
  * compares keys and times with the natural null-first ordering, so
  * NULL keys match NULL keys and a NULL time sorts before every real
  * time — callers with nullable keys/times should filter or coalesce
  * first (equi-join NULL-never-matches semantics would need a
  * null-guard here; the fixture columns are non-null and the
  * tagged-union window form shares the same caveat). */
case class AsOfJoin(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTiebreak: Expression,
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  // the merge comparators are built from the LEFT side's types and
  // applied to BOTH sides' projections — a width/encoding mismatch
  // would corrupt results silently, so reject it at construction
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key types differ: ${leftKeys.map(_.dataType)} vs " +
      s"${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs " +
      s"${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tb, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression],
    rightKeys: Seq[Expression], leftTime: Expression,
    rightTime: Expression, rightTiebreak: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def nodeName: String = "AsOfJoin"

  /** Both sides cluster on their equi keys — the same contract a
    * shuffled equi join declares, so EnsureRequirements co-partitions
    * them (and AQE may coalesce both together). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) ::
      ClusteredDistribution(rightKeys) :: Nil

  /** The merge emits rows in the probe side's order and partition
    * layout, so advertise both — a downstream groupBy/join on the
    * probe key reuses the exchange and the (key, time) sort instead
    * of re-shuffling (the plan-shape saving the class doc claims). */
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    requiredChildOrdering.head

  /** Per-partition sort contract the merge relies on: probe by
    * (key, time); build by (key, time, tiebreak) so "last admitted"
    * is well-defined under time ties. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+
      SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending),
        SortOrder(rightTiebreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering
        .createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(lt.dataType))
      // bind against NULLABLE right attrs: unmatched probe rows read
      // the all-null placeholder, and a build column that was
      // non-nullable at the source must still null-check here
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // single-row lookahead on the build side; rows are COPIED out of
      // the iterator because Spark reuses row objects across next()
      var rNext: InternalRow =
        if (rIter.hasNext) rIter.next().copy() else null
      // the one-candidate state: the latest admitted build row + its
      // key (both copies, immune to projection-buffer reuse)
      var candKey: InternalRow = null
      var cand: InternalRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l).copy()
        if (candKey != null && keyOrd.compare(candKey, lKey) != 0) {
          candKey = null; cand = null
        }
        var done = false
        while (!done && rNext != null) {
          val c = keyOrd.compare(rKeyProj(rNext), lKey)
          if (c < 0) {
            rNext = if (rIter.hasNext) rIter.next().copy() else null
          } else if (c == 0 &&
              timeOrd.compare(rTimeProj(rNext), lTime) <= 0) {
            cand = rNext
            candKey = lKey.copy()
            rNext = if (rIter.hasNext) rIter.next().copy() else null
          } else done = true
        }
        val matched = cand != null && candKey != null &&
          keyOrd.compare(candKey, lKey) == 0
        resultProj(joined(l, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Library entry point, name-resolved like [[TopKPerKey.of]]. Joins
  * `probe` LEFT OUTER AS-OF against `build` on equal `key`, matching
  * the latest build row with `buildTime` ≤ `probeTime` (ties on
  * buildTime broken by the greatest `buildTiebreak`). */
object AsOfJoin {
  def of(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, probeTime: String, buildTime: String,
      buildTiebreak: String): DataFrame = {
    val lPlan = probe.queryExecution.analyzed
    val rPlan = build.queryExecution.analyzed
    val resolver = probe.sparkSession.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}")
        case dups => throw new IllegalArgumentException(
          s"column $name is ambiguous: ${dups.map(_.name)}")
      }
    GraftSqlShim.ofRows(probe.sparkSession,
      AsOfJoin(Seq(attr(lPlan, probeKey)), Seq(attr(rPlan, buildKey)),
        attr(lPlan, probeTime), attr(rPlan, buildTime),
        attr(rPlan, buildTiebreak), lPlan, rPlan))
  }
}
