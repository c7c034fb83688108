package graft.functions.cat

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0,
  * (acc,v) -> acc+v)` — into the native codegen'd [[DotProductD]].
  *
  * Users (and the engine's own older call sites) writing the
  * idiomatic HOF form get the 7× compiled loop automatically; the
  * rewrite is semantics-preserving because DotProductD performs the
  * identical strict left-to-right summation from 0.0 AND matches the
  * HOF null semantics exactly (null on null array, length mismatch,
  * or null element — see DotProductD's scaladoc), so it is safe to
  * fire on ragged or null-element data.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** body is exactly `x * y` over the two lambda variables (either order). */
  private def isMul(body: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = body match {
    case Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == x.exprId && b.exprId == y.exprId) ||
        (a.exprId == y.exprId && b.exprId == x.exprId)
    case _ => false
  }

  /** body is exactly `acc + v` (either order). */
  private def isAdd(body: Expression, acc: NamedLambdaVariable,
      v: NamedLambdaVariable): Boolean = body match {
    case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == acc.exprId && b.exprId == v.exprId) ||
        (a.exprId == v.exprId && b.exprId == acc.exprId)
    case _ => false
  }

  private def isIdentity(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(l, r,
              LambdaFunction(mulBody, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            finish: LambdaFunction)
          if isZeroD(zero) && isMul(mulBody, x, y) && isAdd(addBody, acc, v) &&
            isIdentity(finish) &&
            l.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            l.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType == DoubleType &&
            r.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType == DoubleType =>
        DotProductD(l, r)
    }
}
