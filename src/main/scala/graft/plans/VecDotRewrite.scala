package graft.plans

import graft.functions.VecDotExpr
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate,
  Cast, Expression, LambdaFunction, Literal, Multiply, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the portable HOF dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => double(x) * double(y)),
  *             0.0, (acc, v) => acc + v)
  *
  * over two float vectors into the native codegen'd [[VecDotExpr]].
  * The fold is left-to-right double accumulation in both forms, so the
  * rewrite is bit-exact — callers who write the pure-built-in form
  * (e.g. for portability with the DuckDB oracle) silently get the fast
  * path. Injected via `SparkSessionExtensions.injectOptimizerRule`
  * (graft.functions.GraftExtensions) — the (c) rung of SURVEY.md §4.2's
  * custom-machinery ladder, used here because no DataFrame-level API
  * can rewrite an already-composed expression tree. */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def unwrapDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            zip @ ZipWith(l, r,
              LambdaFunction(mul: Multiply, Seq(x, y), _)),
            Literal(zero, DoubleType),
            LambdaFunction(add: Add, Seq(acc, v), _),
            LambdaFunction(fin, Seq(fv), _))
          if zero == 0.0d &&
            isFloatArray(l) && isFloatArray(r) &&
            unwrapDoubleCast(mul.left).semanticEquals(x) &&
            unwrapDoubleCast(mul.right).semanticEquals(y) &&
            add.left.semanticEquals(acc) &&
            add.right.semanticEquals(v) &&
            fin.semanticEquals(fv) =>
        VecDotExpr(l, r)
    }
}
