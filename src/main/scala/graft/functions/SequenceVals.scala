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

/** DuckDB `current_setting('key')` — reads the session conf (where our
  * SET statement writes, via Spark's runtime conf). Always VARCHAR (DuckDB
  * types its own settings; ours are the conf's string form — documented).
  * Unknown keys error loudly like DuckDB's "unrecognized configuration
  * parameter". */
case class CurrentSetting(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "current_setting"
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def nullSafeEval(k: Any): Any =
    CurrentSetting.read(k.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k =>
      s"${ev.value} = graft.functions.CurrentSetting.read($k);")
  override protected def withNewChildInternal(c: Expression): CurrentSetting =
    copy(child = c)
}

object CurrentSetting {
  def read(k: UTF8String): UTF8String = {
    val key = k.toString
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val v0 = try conf.getConfString(key) catch {
      case _: java.util.NoSuchElementException =>
        throw new IllegalStateException(
          s"""unrecognized configuration parameter "$key"""")
    }
    // Spark's SET stores `x = '2GB'` quotes-and-all; unquote exactly like
    // the plan-time literal-key branch so both paths agree
    val v = if (v0.length >= 2 && v0.startsWith("'") && v0.endsWith("'"))
      v0.substring(1, v0.length - 1) else v0
    UTF8String.fromString(v)
  }
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
