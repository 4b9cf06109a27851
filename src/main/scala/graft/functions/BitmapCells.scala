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
  * `MAP<BIGINT, BINARY>`: the value domain splits into 32768-wide
  * buckets (floorDiv — bijective over ALL longs, negatives included)
  * and each bucket holds an ADAPTIVE container, the Roaring-bitmap
  * discipline: a sorted 2-byte position array while the bucket holds
  * ≤2048 values, promoted to a 4 KB bitmap past that — the crossover
  * where the array form stops being smaller. Adaptivity is the scale
  * contract, measured, not assumed: the first cut stored a fixed
  * 4 KB bitmap per touched bucket (Spark's own `bitmap_construct_agg`
  * encoding), which is right for LOCALLY DENSE ids but exploded on
  * the sf10gk fixture — ~2k distinct orderkeys per cell SPREAD OVER A
  * 10⁹ key range put nearly every value in its own bucket, ~8 MB per
  * cell, ~60 GB through the build shuffle, and the round-16 navigator
  * rung timed out. With array containers the same cell is ~4 KB
  * (2 bytes per sparse value), and a genuinely dense bucket still
  * caps at 4 KB + tag.
  *
  * [[BitmapMapConstructAgg]] BUILDS cells directly from raw long
  * values in one aggregation — no fixed-size per-bucket intermediate,
  * no second grouping level, no map_from_entries fold-in join.
  * [[BitmapMapCountAgg]] re-aggregates: OR the per-bucket containers
  * across cells, Σ cardinality of the union. Set union is
  * associative, commutative and IDEMPOTENT — which is exactly why
  * this cell type composes with every navigator path for free:
  * grouping-sets Expand replicates cells (union of a set with itself
  * is itself), star join-back duplicates whole cells per dim match
  * (same), and the lattice builds coarse cells from fine ones with
  * [[BitmapMapMergeAgg]] (union again — no double-count is possible
  * by algebra, not by bookkeeping). The trade vs an HLL cell is
  * exactness bought with size ∝ distinct values (2 bytes each when
  * sparse), paid only for buckets a value actually hit; the
  * alternative — the base table's countDistinct expand + double
  * shuffle — never runs.
  *
  * Container wire format (the BINARY map value): length 4096 = a raw
  * legacy bitmap as `bitmap_construct_agg` emits it (accepted so
  * cells built with Spark's SQL bitmap functions — position =
  * `bitmap_bit_position`, bucket = `bitmap_bucket_number` — keep
  * merging; a registration must build all its cells ONE way, either
  * convention works since merge keys on the bucket column); otherwise
  * byte 0 is a tag: 0 = sorted big-endian 2-byte positions (length
  * 1+2n, always odd), 1 = 4096-byte bitmap (length 4097). NULL
  * handling: construct skips null inputs (COUNT DISTINCT semantics)
  * and an all-NULL cell is simply a NULL map, which every aggregate
  * here skips — re-aggregating to 0. */
final class BmContainer {
  /** sorted ascending while sparse; null once promoted to `bits` */
  var positions: Array[Short] = new Array[Short](8)
  var n: Int = 0
  var bits: Array[Byte] = null
  /** true iff a LEGACY raw-4096 container (Spark's SQL bitmap
    * functions, 1-based positions) was ever OR'd in. Cardinality and
    * merging are convention-agnostic, but VALUE reconstruction
    * (sum-distinct) is not — [[BitmapMapSumAgg]] fails loud on such
    * containers instead of summing off-by-one values. Propagated
    * through serialization (dense tag 3). */
  var legacy: Boolean = false

  def cardinality: Long =
    if (bits == null) n.toLong
    else {
      var total = 0L
      var i = 0
      while (i < bits.length) {
        total += Integer.bitCount(bits(i) & 0xff); i += 1
      }
      total
    }

  private def promote(): Unit = {
    bits = new Array[Byte](4096)
    var i = 0
    while (i < n) {
      val p = positions(i) & 0xffff
      bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
      i += 1
    }
    positions = null
    n = 0
  }

  def add(pos: Int): Unit = {
    if (bits != null) {
      bits(pos >> 3) = (bits(pos >> 3) | (1 << (pos & 7))).toByte
      return
    }
    // binary search over unsigned shorts
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = positions(mid) & 0xffff
      if (v < pos) lo = mid + 1 else hi = mid
    }
    if (lo < n && (positions(lo) & 0xffff) == pos) return
    if (n == 2048) { promote(); add(pos); return }
    if (n == positions.length)
      positions = java.util.Arrays.copyOf(positions,
        math.min(2048, positions.length * 2))
    System.arraycopy(positions, lo, positions, lo + 1, n - lo)
    positions(lo) = pos.toShort
    n += 1
  }

  def orBits(other: Array[Byte]): Unit = {
    if (bits == null) promote()
    var i = 0
    while (i < other.length && i < bits.length) {
      bits(i) = (bits(i) | other(i)).toByte; i += 1
    }
  }

  def mergeIn(other: BmContainer): Unit = {
    if (other.bits != null) orBits(other.bits)
    else {
      var i = 0
      while (i < other.n) { add(other.positions(i) & 0xffff); i += 1 }
    }
    legacy ||= other.legacy
  }

  /** Enumerate set positions ascending (sparse or dense). */
  def foreachPos(f: Int => Unit): Unit =
    if (bits == null) {
      var i = 0
      while (i < n) { f(positions(i) & 0xffff); i += 1 }
    } else {
      var p = 0
      while (p < 32768) {
        if ((bits(p >> 3) & (1 << (p & 7))) != 0) f(p)
        p += 1
      }
    }

  /** Tagged wire bytes (see the format note above). */
  def serialize(): Array[Byte] =
    if (bits != null) {
      val out = new Array[Byte](4097)
      out(0) = if (legacy) 3 else 1
      System.arraycopy(bits, 0, out, 1, 4096)
      out
    } else {
      val bb = ByteBuffer.allocate(1 + 2 * n)
      bb.put(0: Byte)
      var i = 0
      while (i < n) { bb.putShort(positions(i)); i += 1 }
      bb.array()
    }
}

object BmContainer {
  /** Decode any accepted wire form into a fresh container. */
  def deserialize(bytes: Array[Byte]): BmContainer = {
    val c = new BmContainer
    orInto(c, bytes)
    c
  }

  /** OR any accepted wire form into an existing container. */
  def orInto(c: BmContainer, bytes: Array[Byte]): Unit =
    if (bytes.length == 4096) { // legacy raw bitmap
      c.orBits(bytes)
      c.legacy = true
    } else bytes(0) match {
      case 1 | 3 =>
        val raw = new Array[Byte](4096)
        System.arraycopy(bytes, 1, raw, 0, 4096)
        c.orBits(raw)
        if (bytes(0) == 3) c.legacy = true
      case _ =>
        val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1)
        while (bb.remaining() >= 2) c.add(bb.getShort & 0xffff)
    }
}

final class BitmapMapBuffer {
  val buckets = new java.util.HashMap[Long, BmContainer]()

  private def containerFor(bucket: Long): BmContainer = {
    var c = buckets.get(bucket)
    if (c == null) { c = new BmContainer; buckets.put(bucket, c) }
    c
  }

  /** Add one raw VALUE (the construct path): floorDiv/floorMod
    * bucketing, bijective over all longs. */
  def addValue(v: Long): Unit =
    containerFor(Math.floorDiv(v, 32768L))
      .add(Math.floorMod(v, 32768L).toInt)

  /** OR one wire-form container under a bucket key (merge/count
    * paths). */
  def orIn(bucket: Long, bytes: Array[Byte]): Unit =
    BmContainer.orInto(containerFor(bucket), bytes)

  def mergeIn(other: BitmapMapBuffer): Unit =
    other.buckets.forEach((k, v) => containerFor(k).mergeIn(v))

  def popCount: Long = {
    var total = 0L
    buckets.forEach((_, c) => total += c.cardinality)
    total
  }

  /** Σ of the VALUES in the set — exact sum-distinct, reconstructing
    * each value as bucket·32768 + position (the floorDiv/floorMod
    * bijection [[addValue]] encodes with, negatives included). Fails
    * LOUD on a legacy-origin container: 1-based legacy positions
    * would reconstruct off-by-one values, and a wrong sum is worse
    * than an error. `ansi` selects overflow behavior to match the
    * query's Sum eval mode: checked (throws) vs Long ring
    * arithmetic. */
  def sumValues(ansi: Boolean): Long = {
    var total = 0L
    buckets.forEach { (bucket, c) =>
      if (c.legacy) throw new IllegalStateException(
        "bitmap_map_sum_agg: cell contains a legacy raw-4096 " +
          "container (1-based positions); exact sum-distinct " +
          "requires bitmap_map_construct_agg-built cells")
      val baseV =
        if (ansi) Math.multiplyExact(bucket, 32768L)
        else bucket * 32768L
      c.foreachPos { p =>
        total =
          if (ansi) Math.addExact(total, Math.addExact(baseV, p.toLong))
          else total + baseV + p
      }
    }
    total
  }

  def serialize(): Array[Byte] = {
    val parts = new java.util.ArrayList[(Long, Array[Byte])](
      buckets.size)
    var size = 4
    buckets.forEach { (k, c) =>
      val b = c.serialize()
      parts.add((k, b))
      size += 12 + b.length
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(parts.size)
    parts.forEach { case (k, b) =>
      bb.putLong(k).putInt(b.length).put(b)
    }
    bb.array()
  }

  /** Deterministic map output (sorted buckets): eval order must not
    * depend on hash-map iteration, or re-runs of a lattice build
    * would produce byte-different (still semantically equal) cells. */
  def toMapData: MapData = {
    val sorted = new java.util.TreeMap[Long, BmContainer](buckets)
    val keys = new Array[Any](sorted.size)
    val vals = new Array[Any](sorted.size)
    var i = 0
    sorted.forEach { (k, c) =>
      keys(i) = k; vals(i) = c.serialize(); i += 1
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
      buf.orIn(k, arr)
      i += 1
    }
    buf
  }
}

private[functions] trait BitmapMapAggBase
  extends TypedImperativeAggregate[BitmapMapBuffer]
  with UnaryLike[Expression] {

  override def nullable: Boolean = false

  override def createAggregationBuffer(): BitmapMapBuffer =
    new BitmapMapBuffer

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

private[functions] trait BitmapMapInputAggBase extends BitmapMapAggBase {
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
}

/** BUILD a distinct cell from raw long values, one aggregation pass
  * (see [[BmContainer]] — adaptive containers, no fixed-size
  * intermediate). Null inputs are skipped (COUNT DISTINCT
  * semantics). */
case class BitmapMapConstructAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapAggBase {

  override def prettyName: String = "bitmap_map_construct_agg"
  override def dataType: DataType =
    MapType(LongType, BinaryType, valueContainsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires BIGINT, got $other")
    }

  override def update(buffer: BitmapMapBuffer,
      input: InternalRow): BitmapMapBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.addValue(v.asInstanceOf[Long])
    buffer
  }

  override def eval(buffer: BitmapMapBuffer): Any = buffer.toMapData

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BitmapMapConstructAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BitmapMapConstructAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapMapConstructAgg =
    copy(child = newChild)
}

/** Σ cardinality of the union of bucketed cells — the navigator's
  * rewritten form of `COUNT(DISTINCT m)` (see [[BmContainer]]). */
case class BitmapMapCountAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapInputAggBase {

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

/** Σ of the union's VALUES — the navigator's rewritten form of
  * `sum(DISTINCT m)` (round 16): the adaptive container IS the exact
  * value set (bucket·32768 + position is the value), so the distinct
  * sum is recoverable from cells with the same union-idempotence
  * guarantees as the count. NULL on an empty union (Sum's empty/
  * all-null contract); requires construct-built cells (legacy-origin
  * containers fail loud — see [[BitmapMapBuffer.sumValues]]). */
case class BitmapMapSumAgg(
    child: Expression,
    ansi: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapInputAggBase {

  override def prettyName: String = "bitmap_map_sum_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def eval(buffer: BitmapMapBuffer): Any =
    if (buffer.buckets.isEmpty) null else buffer.sumValues(ansi)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BitmapMapSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): BitmapMapSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapMapSumAgg = copy(child = newChild)
}

/** Union of bucketed cells, returned as a cell again — the
  * lattice-build / incremental-maintenance side: coarse-grain distinct
  * cells derive from fine-grain ones without touching base, and a
  * refreshed partition's cells merge into the store idempotently (see
  * [[BmContainer]]). */
case class BitmapMapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends BitmapMapInputAggBase {

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
