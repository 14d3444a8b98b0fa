package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognize the declarative dot-product spelling
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (s, v) -> s + v)
  *
  * and rewrite it to the codegen'd [[DotProduct]] expression. The fold
  * spelling allocates a zipped struct array per row; the native
  * expression is a primitive loop summing in the same index order, so
  * the rewrite is result-identical (bit-for-bit) and purely physical.
  *
  * Matching is deliberately conservative: exact lambda shapes only —
  * anything else is left untouched.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVars(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1.semanticEquals(v1) && e2.semanticEquals(v2)) ||
      (e1.semanticEquals(v2) && e2.semanticEquals(v1))

  private def isMultiplyLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x, y, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      isVars(x, y, a, b)
    case _ => false
  }

  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x, y, _), Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      isVars(x, y, a, b)
    case _ => false
  }

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.semanticEquals(a)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, zf), Literal(0.0, DoubleType), mf, ff)
          if isMultiplyLambda(zf) && isAddLambda(mf) && isIdentityLambda(ff) &&
            isDoubleArray(l.dataType) && isDoubleArray(r.dataType) =>
        DotProduct(l, r)
    }
}
