package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule (injected via GraftExtensions): fuse the
  * higher-order-function dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v) }}}
  *
  * into the codegen'd [[DotProduct]] expression. The HOF form
  * evaluates per-element lambdas, materializes the zipped array, and —
  * because HOFs don't participate in whole-stage codegen — drops the
  * entire projection stage to interpreted mode. The fused form is one
  * loop inside WSCG with bit-identical semantics (left fold from 0.0,
  * null on length mismatch or null elements), so user queries written
  * declaratively get the native fast path for free — the Catalyst
  * equivalent of a database rewriting `exp(ln(x)*y)` into `pow`. */
object FuseDotProduct extends Rule[LogicalPlan] {

  private def sameVars(e1: Expression, e2: Expression,
                       v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == v1.exprId && b.exprId == v2.exprId) ||
          (a.exprId == v2.exprId && b.exprId == v1.exprId)
      case _ => false
    }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r,
          LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        zero,
        LambdaFunction(Add(ax, ay, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(f: NamedLambdaVariable), _))
      if isDoubleArray(l) && isDoubleArray(r) &&
        isZero(zero) &&
        sameVars(mx, my, x, y) && sameVars(ax, ay, a, b) &&
        fin.exprId == f.exprId =>
      DotProduct(l, r)
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _ => false
  }
}
