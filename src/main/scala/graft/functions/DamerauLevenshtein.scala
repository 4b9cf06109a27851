package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** TRUE Damerau-Levenshtein distance (Lowrance–Wagner: adjacent
  * transposition is a first-class edit whose pieces may be edited
  * again later), pinned to the variant DuckDB's `damerau_levenshtein`
  * exposes — verified empirically before implementation and locked in
  * OperatorSuite:
  *
  *   dl('CA','ABC') = 2   ← the discriminating case: the cheaper
  *                          "optimal string alignment" restriction
  *                          (no substring edited twice) returns 3
  *   dl('ab','ba')  = 1,  dl('kitten','sitting') = 3,
  *   dl('','abc')   = 3,  dl('','') = 0
  *
  * Spark ships `levenshtein` but nothing transposition-aware, and for
  * name/identifier matching transpositions are the dominant typo class
  * (the reason the Damerau literature reports ~80% of human errors as
  * single insert/delete/substitute/TRANSPOSE). The full Lowrance–Wagner
  * DP: a (l1+2)×(l2+2) matrix with a sentinel row/column at maxdist,
  * plus per-character last-match bookkeeping (`da`), so the transpose
  * candidate `d[k][l] + (i−k−1) + 1 + (j−l−1)` can reach back across
  * intervening edits.
  *
  * Same (b)-rung design as [[JaroWinklerExpr]]: a native Catalyst
  * `Expression` whose `doGenCode` emits a static call, keeping the
  * scorer inside whole-stage codegen (a Scala UDF would fence the
  * generated loop at every pair). O(l1·l2) time, O(l1·l2) ints of
  * scratch — callers bound inputs to fixed prefixes exactly as the
  * levenshtein row (E81) documents; at corpus scale the pair
  * generator is LSH/blocking (X2, E254), never all-pairs. */
object DamerauLevenshteinHelper {
  def distance(a: UTF8String, b: UTF8String): Int = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0) return l2
    if (l2 == 0) return l1
    val maxDist = l1 + l2
    // d is (l1+2) x (l2+2); row/col 0 hold the maxdist sentinel the
    // transpose lookup falls back to when a character was never seen
    val w = l2 + 2
    val d = new Array[Int]((l1 + 2) * w)
    d(0) = maxDist
    var i = 0
    while (i <= l1) {
      d((i + 1) * w) = maxDist
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= l2) {
      d(j + 1) = maxDist
      d(w + j + 1) = j
      j += 1
    }
    // last row index (1-based) where each character matched in s1
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= l1) {
      var db = 0
      j = 1
      while (j <= l2) {
        val k: Int = {
          val v = da.get(s2.charAt(j - 1))
          if (v == null) 0 else v.intValue()
        }
        val l = db
        val cost = if (s1.charAt(i - 1) == s2.charAt(j - 1)) {
          db = j; 0
        } else 1
        val subst = d(i * w + j) + cost
        val insert = d((i + 1) * w + j) + 1
        val delete = d(i * w + j + 1) + 1
        val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = subst
        if (insert < m) m = insert
        if (delete < m) m = delete
        if (transp < m) m = transp
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(s1.charAt(i - 1), i)
      i += 1
    }
    d((l1 + 1) * w + l2 + 1)
  }
}

/** Codegen'd binary expression; registered as `damerau_levenshtein`
  * by [[GraftExtensions]]. Null-safe: null in → null out. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshteinHelper.distance(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshteinHelper.distance($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DamerauLevenshteinExpr = copy(newLeft, newRight)
}
