package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ceil, Floor}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.functions.FloorCeilDblExpr

/** floor()/ceil() over DOUBLE/FLOAT stay DOUBLE like DuckDB instead of
  * Spark's LONG (r13 dec fuzz seed-55 — the LONG form renders '-3' where
  * duck renders '-3.0' through every string surface, and ANSI-overflows
  * past 2^63 where duck passes the already-integral double through).
  * Kernel replacement, not a Cast wrap: a Cast(Floor(…)) rewrite would
  * re-match its own child on the next analyzer iteration. DECIMAL
  * inputs keep Spark's Floor/Ceil (DECIMAL(p,0) result — matches duck,
  * probed). Resolution-time so literal folding bakes the duck type. */
object FloorCeilToDbl extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case f: Floor if f.childrenResolved &&
        (f.child.dataType == DoubleType || f.child.dataType == FloatType) =>
      FloorCeilDblExpr(f.child, isCeil = false)
    case c: Ceil if c.childrenResolved &&
        (c.child.dataType == DoubleType || c.child.dataType == FloatType) =>
      FloorCeilDblExpr(c.child, isCeil = true)
  }
}
