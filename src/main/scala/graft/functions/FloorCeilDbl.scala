package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DuckDB's floor()/ceil() over DOUBLE/FLOAT keep DOUBLE (r13 dec fuzz,
  * seed-55: `CAST(ceil(<double>) AS VARCHAR)` renders '-3.0' in duck)
  * where Spark's return LONG ('-3') — a silent rendering divergence in
  * every string conversion (explicit VARCHAR casts, `||` concat) and an
  * ANSI overflow past 2^63 where duck passes the already-integral double
  * through. Math.floor/ceil of a double IS duck's result bit-exactly.
  * Installed by [[graft.plans.FloorCeilToDbl]] for double/float inputs
  * only — DECIMAL floor/ceil keep Spark's DECIMAL(p,0) result, which
  * matches duck's (both probed r13). */
case class FloorCeilDblExpr(child: Expression, isCeil: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String =
    if (isCeil) "graft_ceil_dbl" else "graft_floor_dbl"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} requires a double or float input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = {
    val d = a match {
      case x: java.lang.Double => x.doubleValue()
      case x: java.lang.Float => x.doubleValue()
    }
    if (isCeil) Math.ceil(d) else Math.floor(d)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isCeil) "ceil" else "floor"
    defineCodeGen(ctx, ev, x => s"java.lang.Math.$fn((double)($x))")
  }
  override protected def withNewChildInternal(c: Expression): FloorCeilDblExpr =
    copy(child = c)
}
