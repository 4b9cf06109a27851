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
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  * per-partition sort is the dominant cost.
  *
  * The strategy plans the operator TWO-PHASE, mirroring partial/final
  * aggregation (and Spark's own WindowGroupLimit): a map-side partial
  * pass runs the same bounded-heap pruning on each input partition
  * BEFORE the key exchange, so at most `map-partitions · keys · k`
  * rows cross the network instead of the full child output; the final
  * pass after the exchange merges the survivors. Top-k per key is
  * decomposable (the global top-k of a key is contained in the union
  * of per-partition top-k's), so the split is exact.
  *
  * Memory bound (cf. round-5 advisory): each pass holds O(distinct
  * keys in its partition · k) rows in an in-heap HashMap, capped per
  * task. The PARTIAL pass caps its key map at
  * `graft.topk.maxPartialKeys` keys PER TASK (default 1M — size it to
  * heap / (task slots · k · row size)): once the cap is reached, rows
  * of unseen keys stream through UNPRUNED instead of growing the map —
  * always correct (partial pruning is an optimization; the final pass
  * prunes whatever reaches it), trading shuffle volume for map-side
  * memory safety. The FINAL pass caps at `graft.topk.maxFinalKeys`
  * (default 1M) with an EXACT degrade path — pass-through is not an
  * option post-exchange, so over-cap rows SPILL to a local temp file
  * and are drained in follow-up chunks of up to `cap` fresh keys each
  * (a key's rows land wholly in the one chunk that owns it, so the
  * per-key heap still sees every row — exactness is chunk-invariant,
  * suite-proven against the Window form with the cap forced below the
  * key count). Memory stays O(cap · k) rows per reducer; disk is
  * bounded by the over-cap share of that reducer's input, mirroring
  * how the Window form's sort would have spilled the same rows. At
  * near-identity key domains (keys ≈ rows, where top-k-per-key
  * degenerates anyway) the Window `row_number` form remains the better
  * plan: one sort instead of ~keys/cap spill chunks. */
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
      // final above the (EnsureRequirements-inserted) exchange,
      // partial below it — the partial declares no distribution
      // requirement, so it stays map-side
      TopKPerKeyExec(p, o, k, partial = false,
        TopKPerKeyExec(p, o, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(partitionExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  /** Final pass: rows sharing a key must meet in one partition; the
    * planner inserts the hash Exchange (and AQE coalesces it) exactly
    * as for an aggregate — no sort requirement is declared, which is
    * the whole point. Partial pass: runs on whatever partitioning the
    * child already has (map-side), requiring nothing. */
  override def requiredChildDistribution: Seq[Distribution] =
    (if (partial) UnspecifiedDistribution
     else ClusteredDistribution(partitionExprs)) :: Nil

  /** PER-TASK key-map cap (see class doc), validated so a bad setting
    * fails loudly at the operator, naming the key — and can never
    * silently disable pruning (<= 0) or crash as a bare
    * NumberFormatException. */
  private def readCap(key: String): Int = {
    val raw = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(key, "1048576")
    val parsed = scala.util.Try(raw.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$key must be a positive integer, got '$raw'"))
    require(parsed > 0L, s"$key must be positive, got $parsed")
    parsed.min(Int.MaxValue.toLong).toInt
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val pExprs = partitionExprs
    val ord = order
    val kk = k
    val cap = readCap(
      if (partial) "graft.topk.maxPartialKeys"
      else "graft.topk.maxFinalKeys")
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(pExprs, childOutput)
      val rowOrd = RowOrdering.create(ord, childOutput)
      // max-heap on the retained set: the head is the WORST kept row,
      // evicted when a better one arrives
      val heapOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => rowOrd.compare(a, b)
      def insert(heap: mutable.PriorityQueue[InternalRow],
          row: InternalRow): Unit = {
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
        ()
      }
      if (isPartial) {
        // map-side: over-cap keys stream through unpruned (the final
        // pass prunes whatever reaches it) — no buffering, no spill
        val heaps = mutable.HashMap
          .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
        val passThrough = iter.flatMap { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case Some(heap) => insert(heap, row); Iterator.empty
            case None if heaps.size < cap =>
              val heap = mutable.PriorityQueue.empty[InternalRow](heapOrd)
              heaps.put(key.copy(), heap)
              insert(heap, row)
              Iterator.empty
            case None => Iterator.single(row) // final pass prunes
          }
        }
        // lazy ++: the heaps drain only after the child is exhausted
        passThrough ++ heaps.valuesIterator.flatMap(_.toSeq.iterator)
      } else {
        // reduce-side: over-cap keys' rows SPILL to a local temp file
        // and are drained in follow-up chunks (class doc). A key's
        // rows land wholly in the one chunk whose map admitted it —
        // later chunks only ever see keys no earlier map held — so
        // each per-key heap observes every row of its key: exact.
        val nFields = childOutput.length
        val toUnsafe = UnsafeProjection.create(
          childOutput.map(_.dataType).toArray)
        val writeBuffer = new Array[Byte](4096)
        val spillFiles = mutable.ArrayBuffer.empty[java.io.File]
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            spillFiles.foreach { f => f.delete(); () }
          })
        def readSpill(file: java.io.File): Iterator[InternalRow] =
          new Iterator[InternalRow] {
            private val in = new java.io.DataInputStream(
              new java.io.BufferedInputStream(
                new java.io.FileInputStream(file), 1 << 16))
            private var nextLen = advance()
            private def advance(): Int =
              try in.readInt()
              catch { case _: java.io.EOFException =>
                in.close(); file.delete(); -1
              }
            override def hasNext: Boolean = nextLen >= 0
            override def next(): InternalRow = {
              val bytes = new Array[Byte](nextLen)
              in.readFully(bytes)
              val row = new UnsafeRow(nFields)
              row.pointTo(bytes, nextLen)
              nextLen = advance()
              row
            }
          }
        def chunk(source: Iterator[InternalRow]): Iterator[InternalRow] = {
          val heaps = mutable.HashMap
            .empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
          var file: java.io.File = null
          var out: java.io.DataOutputStream = null
          source.foreach { row =>
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) => insert(heap, row)
              case None if heaps.size < cap =>
                val heap =
                  mutable.PriorityQueue.empty[InternalRow](heapOrd)
                heaps.put(key.copy(), heap)
                insert(heap, row)
              case None =>
                if (out == null) {
                  // spill to Spark's executor scratch disks, not
                  // java.io.tmpdir (shim doc)
                  file = GraftSqlShim.createSpillFile(
                    "graft-topk-spill-", ".bin")
                  spillFiles += file
                  out = new java.io.DataOutputStream(
                    new java.io.BufferedOutputStream(
                      new java.io.FileOutputStream(file), 1 << 16))
                }
                val u = toUnsafe(row)
                out.writeInt(u.getSizeInBytes)
                u.writeToStream(out, writeBuffer)
            }
          }
          val emitted = heaps.valuesIterator.flatMap(_.toSeq.iterator)
          if (out == null) emitted
          else {
            out.close()
            val f = file
            // lazy ++: the next chunk opens its spill only after this
            // chunk's heaps drain
            emitted ++ chunk(readSpill(f))
          }
        }
        chunk(iter)
      }
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
    // resolve with the session's resolver (case-insensitive by
    // default, matching DataFrame.col) and reject ambiguity instead
    // of silently taking the first duplicate
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(name: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}")
        case dups => throw new IllegalArgumentException(
          s"column $name is ambiguous: ${dups.map(_.name)}")
      }
    val order = Seq(
      SortOrder(attr(orderCol), if (desc) Descending else Ascending),
      SortOrder(attr(tiebreak), Ascending))
    GraftSqlShim.ofRows(df.sparkSession,
      TopKPerKey(partitionCols.map(attr), order, k, plan))
  }
}
