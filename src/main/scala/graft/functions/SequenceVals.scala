package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `nextval('seq')` / `currval('seq')` — per-row stateful reads of
  * [[graft.engine.Sequences]]. Both override `deterministic` AND `foldable`
  * to false: with a literal argument the default foldable would let
  * constant folding collapse every row to ONE sequence value, and a
  * deterministic nextval could be CSE'd across a projection — either is a
  * silent wrong answer. Codegen'd via static forwarders (no interpreted
  * fallback), like the rest of the kernel family. */
case class NextVal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "nextval"
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullSafeEval(n: Any): Any =
    graft.engine.Sequences.next(n.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"${ev.value} = graft.engine.Sequences.next($n.toString());")
  override protected def withNewChildInternal(c: Expression): NextVal =
    copy(child = c)
}

case class CurrVal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "currval"
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullSafeEval(n: Any): Any =
    graft.engine.Sequences.curr(n.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"${ev.value} = graft.engine.Sequences.curr($n.toString());")
  override protected def withNewChildInternal(c: Expression): CurrVal =
    copy(child = c)
}
