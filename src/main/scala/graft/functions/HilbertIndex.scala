package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** 2D Hilbert-curve index (the `xy2d` transform): the distance along
  * the order-`k` Hilbert curve at grid cell (x, y), side n = 2^k.
  *
  * This is the locality-clustering companion to the z-order layout row
  * (E67 `q_layout_zorder`): both interleave two dimensions into one
  * sort key, but the Hilbert walk never makes the long diagonal jumps
  * Morton order does — CONSECUTIVE indices are always GRID-ADJACENT
  * (|Δx|+|Δy| = 1, pinned by OperatorSuite), so any query rectangle
  * covers fewer, longer index ranges and a range-sorted file layout
  * scans fewer files per rectangle. Delta's OPTIMIZE ZORDER literature
  * and the Hilbert papers both document the ~moderate-but-real skip
  * improvement; the engine offers both and lets the layout job choose.
  *
  * Algorithm: the standard iterative reflect-and-swap walk from the
  * curve's top square down to cell size 1 — per level s: quadrant bits
  * (rx, ry), d += s²·((3·rx) XOR ry), then the lower-left/lower-right
  * quadrant rotations. O(k) integer ops per row, no allocation; the
  * expression is codegen'd via a static call so a layout pass stays
  * inside whole-stage codegen (same (b)-rung design as [[VecDotExpr]]
  * / [[RollingHashExpr]]).
  *
  * Contract: order ∈ [1, 31]; x, y ∈ [0, 2^order) — out-of-domain
  * coordinates throw (a layout key silently wrapping would scatter a
  * partition, the failure mode worth failing loudly on). Null in any
  * argument → null out (TernaryExpression's null-safe default). */
object HilbertHelper {
  def xy2d(order: Int, xin: Long, yin: Long): Long = {
    require(order > 0 && order <= 31,
      s"hilbert_index: order=$order must be in [1, 31]")
    val n = 1L << order
    require(xin >= 0 && xin < n && yin >= 0 && yin < n,
      s"hilbert_index: ($xin, $yin) outside [0, $n) grid")
    var x = xin
    var y = yin
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Codegen'd ternary expression; registered as `hilbert_index(x, y,
  * order)` by [[GraftExtensions]]. */
case class HilbertIndexExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  // AbstractDataType is private[sql] so ExpectsInputTypes is not
  // available to third-party expressions; this explicit override gives
  // the same analysis-time error an ExpectsInputTypes mixin would —
  // without it an INT x/y or BIGINT order survives analysis and dies
  // at runtime (interpreted: ClassCastException; codegen: Janino
  // compile failure). ADVICE r13.
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (x, y, o) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (BIGINT x, BIGINT y, INT order), " +
          s"got (${x.sql}, ${y.sql}, ${o.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any, o: Any): Any =
    HilbertHelper.xy2d(o.asInstanceOf[Int], x.asInstanceOf[Long],
      y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, o) =>
      s"graft.functions.HilbertHelper.xy2d($o, $x, $y)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HilbertIndexExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
