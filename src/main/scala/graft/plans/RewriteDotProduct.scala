package graft.plans

import graft.functions.ArrayDot
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.ArrayAggregate
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: the declarative double dot product
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * → `graft_dot(a, b)` (functions/ArrayDot, codegen'd).
  *
  * Higher-order functions are CodegenFallback: the declarative form
  * allocates an intermediate products array per row and interprets both
  * lambdas. ArrayDot is the same fold in generated code — bit-identical by
  * construction (index-order multiply-accumulate from a 0.0 accumulator,
  * null on null input / length mismatch / null element, exactly zip_with's
  * null padding + null-propagating * and +) — so rewriting is always safe
  * when the arithmetic is double-precision.
  *
  * Conservatively fires only when:
  *  - the multiply is double * double (element type double, or float/double
  *    cast to double — float*float is a FLOAT multiply whose rounding
  *    differs, left alone);
  *  - the fold zero is literal +0.0 (bit pattern 0L);
  *  - merge is `acc + v` / `v + acc` (IEEE add commutes) with no finish
  *    transformation.
  *
  * Registered alongside [[RewriteSetSize]] via `GraftExtensions`
  * (`spark.sql.extensions`) and `GraftFunctions.registerOptimizations`, so
  * SQL-text pipelines get the native expression without opting in.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case aa @ ArrayAggregate(
            ZipWith(a, b, LambdaFunction(mult, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(merge, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            fin.exprId == fv.exprId &&
            isDoubleMulOf(mult, x, y) && isAccAdd(merge, acc, v) &&
            floatOrDoubleArray(a) && floatOrDoubleArray(b) =>
        ArrayDot(a, b)
    }

  private def floatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** `x * y` where each operand is the lambda var, already double or cast
    * to double (the cast ArrayDot's eval applies per element). */
  private def isDoubleMulOf(e: Expression, x: NamedLambdaVariable,
                            y: NamedLambdaVariable): Boolean = e match {
    case Multiply(l, r, _) if e.dataType == DoubleType =>
      isVarAsDouble(l, x) && isVarAsDouble(r, y)
    case _ => false
  }

  private def isVarAsDouble(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  /** `acc + v` or `v + acc` — double addition commutes bit-exactly. */
  private def isAccAdd(e: Expression, acc: NamedLambdaVariable,
                       v: NamedLambdaVariable): Boolean = e match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _)
        if e.dataType == DoubleType =>
      (l.exprId == acc.exprId && r.exprId == v.exprId) ||
        (l.exprId == v.exprId && r.exprId == acc.exprId)
    case _ => false
  }
}
