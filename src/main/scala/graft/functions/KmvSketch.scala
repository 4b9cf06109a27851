package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  IntegerType, LongType}

/** Mergeable KMV (k-minimum-values) DISTINCT sketch — the fourth member
  * of the sketch-rollup family next to HLL (E44), CMS (E51) and KLL
  * (E61), and the one with a property none of the others have: the
  * sketch's state IS a deterministic artifact (the k smallest distinct
  * hash values), so unlike HLL/CMS/KLL — whose serialized bytes are
  * library-internal and need driver-gated bounded oracles — a KMV
  * query's estimate is EXACTLY reproducible by any engine that can
  * sort: the DuckDB oracle recomputes the same k-th minimum with
  * row_number and matches to the bit (E210).
  *
  * Contract: inputs are uniform hashes in [0, 2⁶⁰) — the portable
  * md5-prefix encoding (`conv(substr(md5(x),1,15),16,10)` /
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) that E206 introduced.
  * The estimator (k−1)·2⁶⁰/h₍ₖ₎ assumes that domain; an under-full
  * sketch (fewer than k distinct hashes) returns its exact count.
  *
  * The buffer is a capped TreeSet (dedup + order in one structure,
  * O(log k) per update with early reject of values above the current
  * k-th), updated per row with no serialization; bytes cross the wire
  * only at shuffle boundaries, as (k, n, ascending longs) — k travels
  * IN the sketch so re-aggregation ([[KmvMergeAgg]]) needs no
  * out-of-band parameter and merging sketches of different k degrades
  * to the smaller k, the same convention as KLL. */
final class KmvBuffer(var k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit =
    if (set.size < k || h < set.last()) {
      set.add(h)
      while (set.size > k) set.pollLast()
    }

  def mergeIn(other: KmvBuffer): Unit = {
    if (other.k < k) {
      k = other.k
      while (set.size > k) set.pollLast()
    }
    other.set.forEach(v => add(v))
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * set.size)
    bb.putInt(k).putInt(set.size)
    set.forEach(v => bb.putLong(v))
    bb.array()
  }
}

object KmvBuffer {
  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  /** Shared estimator: exact count when under-full, (k−1)·2⁶⁰/h₍ₖ₎
    * otherwise — the single double division the oracle mirrors. */
  def estimate(bytes: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    if (n < k) n.toDouble
    else {
      var kth = 0L
      var i = 0
      while (i < n) { kth = bb.getLong; i += 1 }
      (k - 1).toDouble * math.pow(2, 60) / kth.toDouble
    }
  }

  def kept(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(4)
}

/** Build a KMV sketch from pre-hashed longs (see [[KmvBuffer]]). */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 16 && k <= (1 << 20),
    s"KMV k must be in [16, 2^20], got $k")

  override def prettyName: String = "kmv_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer,
      input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = buffer.serialize()
  override def serialize(buffer: KmvBuffer): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchAgg = copy(child = newChild)
}

/** Union of serialized KMV sketches (see [[KmvBuffer]]) — the
  * re-aggregation side over persisted rollups. The k of the result is
  * the MINIMUM k across merged sketches (each sketch carries its own);
  * the fresh buffer starts unbounded and adopts the first input's k. */
case class KmvMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "kmv_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): KmvBuffer =
    new KmvBuffer(Int.MaxValue)

  override def update(buffer: KmvBuffer,
      input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null)
      buffer.mergeIn(KmvBuffer.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = buffer.serialize()
  override def serialize(buffer: KmvBuffer): Array[Byte] =
    buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): KmvMergeAgg = copy(child = newChild)
}

/** Distinct-count estimate from serialized KMV bytes (bounded
  * post-aggregate rows — CodegenFallback costs nothing there). */
case class KmvEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "kmv_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullSafeEval(sk: Any): Any =
    KmvBuffer.estimate(sk.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): KmvEstimateExpr = copy(newChild)
}

/** Number of hash values held by a serialized KMV sketch. */
case class KmvKeptExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def prettyName: String = "kmv_kept"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullSafeEval(sk: Any): Any =
    KmvBuffer.kept(sk.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): KmvKeptExpr = copy(newChild)
}
