package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions.{
  Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply,
  NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule rewriting the built-in higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  * into the native codegen'd [[DotProduct]] expression. HOF lambdas
  * are interpreted (no codegen) and `zip_with` allocates a zipped
  * array per row, so on wide embedding scans the rewrite is ~an order
  * of magnitude faster — and it composes with OTHER rules' output:
  * anywhere the pattern appears (user SQL, views, generated plans) it
  * is replaced, not just where the library's own [[
  * graft.engine.Similarity.dot]] was called explicitly.
  *
  * Strictness: [[DotProduct]] is bit-identical to the HOF form —
  * strict left-to-right summation, null on null arrays, null
  * elements, or length mismatch (`zip_with` pads the short side with
  * null, which nulls the sum) — so the rewrite never changes results.
  * Guards require both inputs to be `array<double>` and the lambdas
  * to be exactly multiply/add over the lambda variables; anything
  * else (casts inside the lambda, reused variables, different zero)
  * is left untouched.
  *
  * Injection: `GraftExtensions` (config-time,
  * `spark.sql.extensions`) or `Tables.tune` (runtime,
  * `spark.experimental.extraOptimizations`).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** body is exactly `op(v1, v2)` (either order) over the two lambda
    * variables. */
  private def refsBoth(l: Expression, r: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply,
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      refsBoth(m.left, m.right, x, y)
    case _ => false
  }

  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add,
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      refsBoth(a.left, a.right, acc, v)
    case _ => false
  }

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable,
        Seq(arg: NamedLambdaVariable), _) => v.exprId == arg.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // the zero must be POSITIVE zero bit-for-bit: `-0.0 == 0.0` is
      // true, but aggregate(..., -0.0d, +) of an empty array returns
      // -0.0 while DotProduct returns 0.0 — a bit-exactness hazard
      case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType),
            merge, finish)
          if zero.isInstanceOf[Double] &&
            java.lang.Double.doubleToRawLongBits(
              zero.asInstanceOf[Double]) == 0L && isDoubleArray(zw.left) &&
            isDoubleArray(zw.right) && isMulLambda(zw.function) &&
            isAddLambda(merge) && isIdentityLambda(finish) =>
        DotProduct(zw.left, zw.right)
    }
}
