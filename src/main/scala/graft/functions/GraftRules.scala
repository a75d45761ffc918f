package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the natural higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[VectorDot]]. Spark evaluates HOF lambdas
  * INTERPRETED — per-element boxed interpreter steps plus a
  * materialized intermediate array per row (the engine's round-1
  * profiling lesson) — while VectorDot is one fused primitive loop
  * inside whole-stage codegen. A user writing the idiomatic HOF form
  * gets the native expression without knowing it exists.
  *
  * Soundness guards:
  *  - the multiply must already be DOUBLE-typed (double arrays, or
  *    casts the analyzer inserted): a float-typed multiply rounds each
  *    product to float, which VectorDot (all-double) would not, so
  *    such plans are left alone rather than silently re-rounded;
  *  - zero must be literal 0.0 double and the finish lambda the
  *    identity, so the aggregate is exactly a sum of products;
  *  - lambda-variable identity is checked by exprId through any casts.
  *
  * Fold order is preserved: both forms accumulate left-to-right in
  * double, so the rewrite is bit-identical, not just approximately
  * equal (pinned by RulesSpec).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  private def isProduct(e: Expression,
                        x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case m: Multiply if m.dataType == DoubleType =>
        (isVar(m.left, x) && isVar(m.right, y)) ||
          (isVar(m.left, y) && isVar(m.right, x))
      case _ => false
    }

  private def isSum(e: Expression,
                    acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    stripCast(e) match {
      case a: Add =>
        (isVar(a.left, acc) && isVar(a.right, v)) ||
          (isVar(a.left, v) && isVar(a.right, acc))
      case _ => false
    }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => isVar(body, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add,
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish)
          if isZeroDouble(zero) && isProduct(mul, x, y) &&
            isSum(add, acc, v) && isIdentity(finish) &&
            VectorDot(a, b).checkInputDataTypes().isSuccess =>
        VectorDot(a, b)
    }
}
