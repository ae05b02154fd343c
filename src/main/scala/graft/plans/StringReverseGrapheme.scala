package graft.plans

import org.apache.spark.sql.catalyst.expressions.Reverse
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.GraphemeReverseExpr

/** reverse() over STRINGS takes duck's grapheme-cluster reversal (r14
  * str fuzz — see [[GraphemeReverseExpr]]); reverse() over arrays stays
  * Spark's native expression. Resolution-time and type-dispatched — a
  * token-level rename could not tell the two apart. */
object StringReverseGrapheme extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case r: Reverse if r.childrenResolved && r.child.dataType == StringType =>
      GraphemeReverseExpr(r.child)
  }
}
