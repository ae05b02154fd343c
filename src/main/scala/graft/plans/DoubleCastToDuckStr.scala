package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType, StringType}

import graft.functions.DoubleStrExpr

/** Every `CAST(double|float AS STRING)` — written or implicit (concat,
  * md5-determinism hashes, `||` coercions) — renders through DuckDB's
  * double formatter instead of Java's `Double.toString` (r13 dec fuzz:
  * Spark flips to `1.23456785E7` scientific at 1e7 where duck prints
  * `12345678.5`; a silent divergence in every stringified double above
  * that or below 1e-3). Runs in the user-provided optimizer batch, so
  * constant-only casts have already folded with Spark's rendering —
  * documented residual; all column-bearing paths are rewritten. */
object DoubleCastToDuckStr extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c: Cast
        if c.childrenResolved && c.dataType == StringType &&
          (c.child.dataType == DoubleType || c.child.dataType == FloatType) =>
      DoubleStrExpr(c.child)
  }
}
