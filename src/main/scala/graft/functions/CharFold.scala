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

/** Column/SQL-level entry points to the portable hash, shared by the
  * LLM-ops queries and the 4CE portable-blur obfuscation path so every
  * consumer (and every DuckDB oracle) folds identically. */
object PortableHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  final val P: Long = CharFoldHelper.P

  /** Native codegen'd form — requires the `char_fold` function
    * registered by [[GraftExtensions]] (graft.Sessions does). */
  def charFold(s: Column): Column = call_function("char_fold", s)

  /** Pure-built-in HOF form — identical values on any SparkSession,
    * no extension registration needed; CodegenFallback-slow, so only
    * for small post-aggregation row counts (e.g. obfuscation noise). */
  def charFoldHof(s: Column): Column =
    aggregate(transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31L + c) % P)

  /** Same hash in DuckDB SQL over the given SQL string expression. */
  def charFoldSql(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($s, ''),
       |    c -> CAST(unicode(c) AS BIGINT))),
       |  (a, c) -> (a * 31 + c) % $P)""".stripMargin
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
