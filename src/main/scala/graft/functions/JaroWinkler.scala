package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, pinned to the semantics DuckDB's
  * `jaro_winkler_similarity` exposes (verified empirically against
  * DuckDB before implementation — see JaroWinklerSuite):
  *
  *   - either side empty → 0.0 (INCLUDING both-empty: DuckDB returns
  *     0.0 for ('',''), not the 1.0 some libraries pick);
  *   - Jaro: match window max(l1,l2)/2 − 1 (floored at 0), greedy
  *     left-to-right matching, transpositions halved,
  *     j = (m/l1 + m/l2 + (m−t)/m) / 3;
  *   - Winkler boost ONLY when j > 0.7 (verified: j=2/3 unboosted,
  *     j=7/9 boosted): j + 0.1·ℓ·(1−j) with common-prefix ℓ capped
  *     at 4.
  *
  * Why a native `Expression` and not a UDF: this sits inside per-pair
  * scoring loops (fuzzy matching after LSH candidate generation), so
  * it must stay inside whole-stage codegen — `doGenCode` emits a
  * static call, no boxing, no lambda dispatch; a Scala UDF would wall
  * off the generated pipeline at every invocation. The O(l1·l2) inner
  * loop is why callers bound inputs to fixed prefixes, same as the
  * levenshtein row (E81).
  */
object JaroWinklerHelper {
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      j + 0.1 * l * (1.0 - j)
    } else j
  }
}

/** Codegen'd binary expression; registered as `jaro_winkler` by
  * [[GraftExtensions]]. Null-safe: null in → null out. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerHelper.similarity(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerHelper.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr = copy(newLeft, newRight)
}
