package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSimilarity, DotProduct}

/** Optimizer rule (injected after [[FuseDotProduct]]): collapse the
  * cosine-similarity idiom
  *
  * {{{ dot(a,b) / sqrt(dot(a,a) * dot(b,b)) }}}
  *
  * — where the three dots have already been fused to [[DotProduct]] by
  * FuseDotProduct — into one [[CosineSimilarity]], replacing three
  * array passes with a single fused loop. Bit-identical by
  * construction: CosineSimilarity accumulates dot/na/nb in the same
  * per-element order and applies the same `dot / sqrt(na * nb)`
  * arithmetic; null/NaN edges match (length mismatch or null element →
  * NULL from every dot → NULL here; zero norms → 0/0 = NaN in both
  * forms). Matching is on semantic equality of the argument
  * expressions, so `cosine(f(x), g(y))` idioms fuse too — as long as
  * the norm dots really are self-dots of the same two arguments. */
object FuseCosine extends Rule[LogicalPlan] {

  private def selfDots(n1: Expression, n2: Expression,
                       a: Expression, b: Expression): Boolean = (n1, n2) match {
    case (DotProduct(a1, a2), DotProduct(b1, b2)) =>
      a1.semanticEquals(a) && a2.semanticEquals(a) &&
        b1.semanticEquals(b) && b2.semanticEquals(b)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(DotProduct(a, b), Sqrt(Multiply(n1, n2, _)), _)
        if selfDots(n1, n2, a, b) || selfDots(n2, n1, a, b) =>
      CosineSimilarity(a, b)
  }
}
