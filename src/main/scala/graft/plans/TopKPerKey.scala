package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Descending, Expression, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

import scala.collection.mutable

/** Whole-operator custom machinery — the (c) rung of SURVEY.md §4.2's
  * ladder, exercised end-to-end: a logical node, a planner strategy
  * injected via `SparkSessionExtensions.injectPlannerStrategy`
  * (graft.functions.GraftExtensions), and a physical operator.
  *
  * Semantics: keep the top `k` rows per key under `order` — identical
  * to `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
  * provided `order` is a TOTAL order (pass a tiebreaker; ties at the
  * boundary are otherwise planner-dependent in BOTH forms).
  *
  * Why a custom operator instead of the Window form: the Window plan
  * must FULLY SORT every partition (Exchange → Sort → Window → Filter)
  * before it can number rows; this operator holds one bounded k-heap
  * per key and never sorts beyond it — O(n log k) comparisons, O(keys·k)
  * memory, no sort spill. At 100 TB with small k the eliminated
  * per-partition sort is the dominant cost. The shuffle on the keys
  * (ClusteredDistribution) is still required and still AQE-managed;
  * only the sort disappears. */
case class TopKPerKey(partitionExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKey = copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(p, o, k, child) =>
      TopKPerKeyExec(p, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(partitionExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Rows sharing a key must meet in one partition; the planner
    * inserts the hash Exchange (and AQE coalesces it) exactly as for
    * an aggregate — no sort requirement is declared, which is the
    * whole point. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pExprs = partitionExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val rowOrd = RowOrdering.create(ord, childOutput)
      // max-heap on the retained set: the head is the WORST kept row,
      // evicted when a better one arrives
      val heapOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => rowOrd.compare(a, b)
      val heaps = mutable.HashMap
        .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](heapOrd))
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.iterator)
    }
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

/** Library entry point: name-resolved so callers never touch catalyst
  * types. `desc` orders the metric descending (top-k); the `tiebreak`
  * column (ascending) makes the order total. */
object TopKPerKey {
  def of(df: DataFrame, partitionCols: Seq[String], orderCol: String,
      desc: Boolean, tiebreak: String, k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute = plan.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name)}"))
    val order = Seq(
      SortOrder(attr(orderCol), if (desc) Descending else Ascending),
      SortOrder(attr(tiebreak), Ascending))
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKey(partitionCols.map(attr), order, k, plan))
  }
}
