package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer gcd/lcm (r7): DuckDB builtins Spark lacks. Probe-pinned on
  * DuckDB 1.0: absolute-value semantics (gcd(-12,18)=6, lcm(-4,6)=12),
  * gcd(0,0)=0, lcm(0,x)=0. Inputs are taken as BIGINT (callers cast);
  * codegen'd inline via static forwarders.
  */
case class GcdExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.gcd(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.gcd((long) $a, (long) $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GcdExpr =
    copy(left = l, right = r)
}

case class LcmExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcm"
  override def nullSafeEval(a: Any, b: Any): Any =
    GcdLcm.lcm(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GcdLcm.lcm((long) $a, (long) $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LcmExpr =
    copy(left = l, right = r)
}

object GcdLcm {
  def gcd(a0: Long, b0: Long): Long = {
    var a = math.abs(a0); var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }

  def lcm(a: Long, b: Long): Long = {
    if (a == 0 || b == 0) return 0L
    val g = gcd(a, b)
    math.abs(a / g * b)
  }
}
