package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper so interpreted eval and generated code share one
  * implementation. Iterates Unicode code points (matching DuckDB's
  * `unicode(c)` and Spark's `ascii(c)` per-character semantics). */
object CharFoldHelper {
  final val P = 1000003L
  def fold(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Native codegen'd form of the portable char-fold polynomial hash
  * `fold(chars, (a,c) => (a*31 + codepoint(c)) mod 1000003)` — same
  * values as the `aggregate(transform(split(s,"")))` HOF chain
  * (LLMOps.charFoldHof) and the DuckDB `list_reduce` oracle form, minus
  * the per-character array allocation and lambda interpretation of the
  * HOF path (it is a CodegenFallback). Registered as `char_fold` by
  * [[GraftExtensions]]. */
case class CharFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_fold"

  override protected def nullSafeEval(input: Any): Any =
    CharFoldHelper.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharFoldHelper.fold($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharFoldExpr = copy(newChild)
}
