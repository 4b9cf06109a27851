package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  LongType}

/** Mergeable theta sketches over Apache DataSketches — the SET-ALGEBRA
  * member of the sketch-rollup family: HLL (E44) answers only
  * distinct-count-of-a-union, CMS (E51) frequency, KLL (E61) quantiles;
  * theta sketches additionally support INTERSECTION and DIFFERENCE
  * cardinality over persisted per-day sketches, the estimator behind
  * "how many users appear in BOTH halves of the month" / "how much does
  * corpus A overlap corpus B" without ever joining the raw 100 TB
  * tables. Same `TypedImperativeAggregate` machinery as the KLL trio
  * (KllSketch.scala): the buffer is a live theta Union (its internal
  * update-sketch gadget), partial-aggregated map-side, serialized as a
  * compact ordered sketch only when crossing the shuffle.
  *
  * Accuracy contract: a theta sketch is EXACT until its retained-entry
  * count exceeds the nominal k (default 4096) and only then samples —
  * so at fixture cardinalities (≤ ~1.5k distinct users per window) the
  * estimates ARE the exact counts and the engine query carries a full
  * DuckDB oracle, while the same query at 100 TB degrades gracefully to
  * ±1.6% (k=4096, 1σ) estimation. BucketingSuite forces estimation
  * mode (small k, 20k ids) and asserts the documented error bound, so
  * both regimes are proven.
  */
case class ThetaSketchAgg(
    child: Expression,
    nomEntries: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(nomEntries >= 16 && (nomEntries & (nomEntries - 1)) == 0,
    s"theta nominal entries must be a power of two >= 16, got $nomEntries")

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nomEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  // partial buffers cross the shuffle as compact ordered sketches —
  // union-of-unions is associative, so reseeding a fresh union with
  // the compact result loses nothing
  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): ThetaSketchAgg = copy(child = newChild)
}

/** Union of serialized theta sketches — the query-time re-aggregation
  * over persisted per-day sketch bytes (never rescanning raw rows).
  * Null inputs (e.g. the CASE-routed window-split idiom) are skipped,
  * which is what makes a one-pass conditional merge possible. */
case class ThetaMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def prettyName: String = "theta_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      buffer.union(Sketches.heapifyCompactSketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): ThetaMergeAgg = copy(child = newChild)
}

/** Estimate from serialized theta sketch bytes (post-aggregate rows —
  * CodegenFallback costs nothing there, as with kll_quantile). */
case class ThetaEstimateExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(sk: Any): Any =
    Sketches.heapifyCompactSketch(
      Memory.wrap(sk.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(
      newChild: Expression): ThetaEstimateExpr = copy(child = newChild)
}

/** Set-algebra estimates over two serialized theta sketches: the
  * intersection (`theta_intersect_estimate`) or difference A∖B
  * (`theta_anotb_estimate`) cardinality — the operations HLL cannot
  * express from merged state. */
case class ThetaSetOpExpr(left: Expression, right: Expression,
    intersect: Boolean)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def prettyName: String =
    if (intersect) "theta_intersect_estimate" else "theta_anotb_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.heapifyCompactSketch(
      Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = Sketches.heapifyCompactSketch(
      Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val r =
      if (intersect)
        SetOperation.builder().buildIntersection().intersect(sa, sb)
      else SetOperation.builder().buildANotB().aNotB(sa, sb)
    r.getEstimate
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaSetOpExpr = copy(newLeft, newRight)
}
