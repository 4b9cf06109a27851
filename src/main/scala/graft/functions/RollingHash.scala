package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp polynomial rolling hashes of every `width`-char window
  * at the given `stride`, in ONE O(n) pass per document.
  *
  * The substring-dedup row (E287 `q_dedup_substring`) materializes
  * each window as a 40-char string: O(n·width/stride) bytes built and
  * shuffled per document, which is the honest oracle-checkable form
  * but not the 100 TB shape. This expression is that recorded scale
  * path (E288): prefix hashes pre[i+1] = pre[i]·B + c over the UTF-16
  * code units, then each window hash is the O(1) difference
  * pre[i+w] − pre[i]·Bʷ — n/stride LONGS out instead of n·width/stride
  * chars, with arithmetic in Java long (mod 2⁶⁴ by natural overflow,
  * B = 1000003 odd so multiplication by B is a bijection mod 2⁶⁴ and
  * windows differing in one char always differ in hash unless a
  * higher-order collision occurs; expected collisions among m windows
  * ≈ m²/2⁶⁵ — ~10⁻¹¹ at the fixture's 13k windows, and the E288 gate
  * would surface one as a parity diff).
  *
  * Same (b)-rung design as [[VecDotExpr]]: a native Catalyst
  * expression whose `doGenCode` emits a static call so the scan stays
  * inside whole-stage codegen. Null-safe: null text → null out; a
  * text shorter than `width` yields an empty array (the row simply
  * contributes no windows). `width`/`stride` must be positive. */
object RollingHashHelper {
  def hashes(s: UTF8String, width: Int, stride: Int): ArrayData = {
    require(width > 0 && stride > 0,
      s"rolling_hashes: width=$width stride=$stride must be positive")
    val str = s.toString
    val n = str.length
    if (n < width) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    val pre = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      pre(i + 1) = pre(i) * B + str.charAt(i)
      i += 1
    }
    var bw = 1L
    i = 0
    while (i < width) { bw *= B; i += 1 }
    val cnt = (n - width) / stride + 1
    val out = new Array[Long](cnt)
    var j = 0
    while (j < cnt) {
      val st = j * stride
      out(j) = pre(st + width) - pre(st) * bw
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd ternary expression; registered as `rolling_hashes` by
  * [[GraftExtensions]]. */
case class RollingHashExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  // analysis-time input validation (see HilbertIndexExpr; ADVICE r13)
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (s, w, st) => TypeCheckResult.TypeCheckFailure(
        s"rolling_hashes requires (STRING text, INT width, INT stride)," +
          s" got (${s.sql}, ${w.sql}, ${st.sql})")
    }

  override def dataType: DataType = ArrayType(LongType, false)
  override def prettyName: String = "rolling_hashes"

  override protected def nullSafeEval(s: Any, w: Any, st: Any): Any =
    RollingHashHelper.hashes(s.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], st.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w, st) =>
      s"graft.functions.RollingHashHelper.hashes($s, $w, $st)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RollingHashExpr =
    copy(newFirst, newSecond, newThird)
}
