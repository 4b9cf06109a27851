package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType,
  MapType}

/** Exact-distinct BITMAP CELLS for the aggregate navigator — the cell
  * type that makes `COUNT(DISTINCT measure)` answerable from a
  * materialized rollup (VERDICT r15 item 1 of the coverage edges).
  *
  * A summary cell stores the measure's exact distinct set as
  * `MAP<BIGINT, BINARY>`: Spark's own bucketed-bitmap encoding —
  * `bitmap_bucket_number(m)` splits the value domain into 32768-bit
  * buckets and `bitmap_construct_agg(bitmap_bit_position(m))` builds
  * one ≤4 KB bitmap per (cell, bucket); `map_from_entries` folds the
  * buckets of one cell into the single map column the navigator
  * re-aggregates. (bucket, position) is a bijection of the value, so
  * the map IS the distinct set, bit-for-bit.
  *
  * Re-aggregation is [[BitmapMapCountAgg]]: OR the per-bucket bitmaps
  * across cells, popcount the union. Set union is associative,
  * commutative and IDEMPOTENT — which is exactly why this cell type
  * composes with every navigator path for free: grouping-sets Expand
  * replicates cells (OR of a bitmap with itself is itself), star
  * join-back duplicates whole cells per dim match (same), and the
  * lattice builds coarse cells from fine ones with
  * [[BitmapMapMergeAgg]] (OR again — no double-count is possible by
  * algebra, not by bookkeeping). The trade vs an HLL cell is exactness
  * bought with size ∝ distinct-values/8 bytes, paid only for buckets a
  * value actually hit; at 100 TB the cells stay kilobytes whenever the
  * per-cell distinct set does, and the alternative — the base table's
  * countDistinct expand + double shuffle — never runs.
  *
  * Build-side contract (enforced by the registration docs, verified by
  * the oracle): construct over NON-NULL measure values only (`WHERE m
  * IS NOT NULL` before the bucket groupBy — COUNT(DISTINCT) skips
  * nulls, and a null bucket key would poison `map_from_entries`); a
  * cell whose measure is all-NULL simply has no map (NULL cell), which
  * both aggregates here skip, re-aggregating to 0 — COUNT(DISTINCT) of
  * an all-NULL group. */
final class BitmapMapBuffer {
  val buckets = new java.util.HashMap[Long, Array[Byte]]()

  def orIn(bucket: Long, bytes: Array[Byte]): Unit = {
    val cur = buckets.get(bucket)
    if (cur == null) {
      // clone: the input array may be a pointer into a reused
      // UnsafeRow buffer, and the buffer outlives the row
      buckets.put(bucket, java.util.Arrays.copyOf(bytes, bytes.length))
    } else if (cur.length >= bytes.length) {
      var i = 0
      while (i < bytes.length) {
        cur(i) = (cur(i) | bytes(i)).toByte; i += 1
      }
    } else {
      val grown = java.util.Arrays.copyOf(bytes, bytes.length)
      var i = 0
      while (i < cur.length) {
        grown(i) = (grown(i) | cur(i)).toByte; i += 1
      }
      buckets.put(bucket, grown)
    }
  }

  def mergeIn(other: BitmapMapBuffer): Unit =
    other.buckets.forEach((k, v) => orIn(k, v))

  def popCount: Long = {
    var total = 0L
    buckets.forEach { (_, bytes) =>
      var i = 0
      while (i < bytes.length) {
        total += Integer.bitCount(bytes(i) & 0xff); i += 1
      }
    }
    total
  }

  def serialize(): Array[Byte] = {
    var size = 4
    buckets.forEach((_, v) => size += 12 + v.length)
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buckets.size)
    buckets.forEach { (k, v) =>
      bb.putLong(k).putInt(v.length).put(v)
    }
    bb.array()
  }

  /** Deterministic map output (sorted buckets): eval order must not
    * depend on hash-map iteration, or re-runs of a lattice build
    * would produce byte-different (still semantically equal) cells. */
  def toMapData: MapData = {
    val keys = new Array[Any](buckets.size)
    val vals = new Array[Any](buckets.size)
    val sorted = new java.util.TreeMap[Long, Array[Byte]](buckets)
    var i = 0
    sorted.forEach { (k, v) =>
      keys(i) = k; vals(i) = v; i += 1
    }
    ArrayBasedMapData(keys, vals)
  }
}

object BitmapMapBuffer {
  def deserialize(bytes: Array[Byte]): BitmapMapBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BitmapMapBuffer
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val k = bb.getLong
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.buckets.put(k, arr)
      i += 1
    }
    buf
  }
}

private[functions] trait BitmapMapAggBase
  extends TypedImperativeAggregate[BitmapMapBuffer]
  with UnaryLike[Expression] {

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(LongType, BinaryType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires MAP<BIGINT, BINARY>, got $other")
    }

  override def createAggregationBuffer(): BitmapMapBuffer =
    new BitmapMapBuffer

  override def update(buffer: BitmapMapBuffer,
      input: InternalRow): BitmapMapBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val m = v.asInstanceOf[MapData]
      m.foreach(LongType, BinaryType, (k, bm) =>
        if (bm != null)
          buffer.orIn(k.asInstanceOf[Long],
            bm.asInstanceOf[Array[Byte]]))
    }
    buffer
  }

  override def merge(buffer: BitmapMapBuffer,
      other: BitmapMapBuffer): BitmapMapBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def serialize(buffer: BitmapMapBuffer): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): BitmapMapBuffer =
    BitmapMapBuffer.deserialize(bytes)
}

/** Σ popcount of the OR-union of bucketed-bitmap cells — the
  * navigator's rewritten form of `COUNT(DISTINCT m)` (see
  * [[BitmapMapBuffer]]). */
case class BitmapMapCountAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapAggBase {

  override def prettyName: String = "bitmap_map_count_agg"
  override def dataType: DataType = LongType

  override def eval(buffer: BitmapMapBuffer): Any = buffer.popCount

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BitmapMapCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BitmapMapCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapMapCountAgg = copy(child = newChild)
}

/** OR-union of bucketed-bitmap cells, returned as a cell again — the
  * lattice-build / incremental-maintenance side: coarse-grain distinct
  * cells derive from fine-grain ones without touching base, and a
  * refreshed partition's cells merge into the store idempotently (see
  * [[BitmapMapBuffer]]). */
case class BitmapMapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapAggBase {

  override def prettyName: String = "bitmap_map_merge_agg"
  override def dataType: DataType =
    MapType(LongType, BinaryType, valueContainsNull = false)

  override def eval(buffer: BitmapMapBuffer): Any = buffer.toMapData

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BitmapMapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BitmapMapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapMapMergeAgg = copy(child = newChild)
}
