package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB VARCHAR subscript/slice semantics (reference passthrough surface,
  * `/root/reference/README.md:41`; probe matrix re-pinned r12):
  *
  *   - 1-based inclusive CHARACTER positions (codepoint-aware, like duck);
  *   - negative positions count from the end: n = len + i + 1
  *     ('abcdef'[-2] = 'e', [-3:-1] = 'def');
  *   - out-of-range single index → '' ([0] = [10] = [-10] = '');
  *   - slice start clamps to ≥ 1 ([-100:2] = 'ab'), end clamps to ≤ len
  *     ([2:100] = 'bcdef'), crossed bounds → '' ([4:2] = [:0] = '');
  *   - any NULL operand → NULL (s[NULL:3] = NULL; literal-NULL bounds are
  *     folded to CAST(NULL AS STRING) by the translator, runtime NULLs
  *     take the null-intolerant path here).
  *
  * r12: these were CASE/substr/length splice emissions (r10 batch 7b);
  * two slice columns in one projection tripped the upstream janino
  * "isNull_N is not an rvalue" subexpression-split bug and fell back to
  * interpreted evaluation. The kernel is a single codegen call — no CASE
  * tree, one evaluation of the receiver — and constant-folds for literal
  * receivers exactly like the old emission. Open slice ends are encoded
  * as Long.MaxValue by the translator ([3:] → graft_str_slice(s, 3,
  * 9223372036854775807)); clamping makes it equivalent to len. */
object StrSubscript {
  /** duck s[i] — see class doc. */
  def index(s: UTF8String, i: Long): UTF8String = {
    val len = s.numChars().toLong
    val n = if (i < 0) len + i + 1 else i
    if (n < 1 || n > len) UTF8String.EMPTY_UTF8
    else s.substringSQL(n.toInt, 1)
  }

  /** duck s[a:b] — see class doc. */
  def slice(s: UTF8String, a: Long, b: Long): UTF8String = {
    val len = s.numChars().toLong
    val na0 = if (a < 0) len + a + 1 else a
    val na = if (na0 < 1) 1L else na0
    val nb0 = if (b < 0) len + b + 1 else b
    val nb = if (nb0 > len) len else nb0
    val cnt = nb - na + 1
    if (cnt <= 0) UTF8String.EMPTY_UTF8
    else s.substringSQL(na.toInt, cnt.toInt)
  }

  private[functions] def checkArgs(name: String,
      types: Seq[(DataType, String)]): TypeCheckResult = {
    types.collectFirst {
      case (t, role) if role == "string" && t != StringType =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires a STRING receiver, got ${t.simpleString}")
      case (t, role) if role == "int" &&
          !Seq(ByteType, ShortType, IntegerType, LongType).contains(t) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires integer bounds, got ${t.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}

/** `graft_str_index(s, i)` — duck's VARCHAR single subscript. */
case class StrIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_str_index"
  override def checkInputDataTypes(): TypeCheckResult =
    StrSubscript.checkArgs(prettyName,
      Seq((left.dataType, "string"), (right.dataType, "int")))
  override protected def nullSafeEval(s: Any, i: Any): Any =
    StrSubscript.index(s.asInstanceOf[UTF8String],
      i.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, i) => s"graft.functions.StrSubscript.index($s, (long)($i))")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrIndexExpr =
    copy(left = l, right = r)
}

/** `graft_str_slice(s, a, b)` — duck's VARCHAR slice (and the
  * array_slice-on-string function form). */
case class StrSliceExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_str_slice"
  override def checkInputDataTypes(): TypeCheckResult =
    StrSubscript.checkArgs(prettyName,
      Seq((first.dataType, "string"), (second.dataType, "int"),
        (third.dataType, "int")))
  override protected def nullSafeEval(s: Any, a: Any, b: Any): Any =
    StrSubscript.slice(s.asInstanceOf[UTF8String],
      a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, a, b) => s"graft.functions.StrSubscript.slice($s, (long)($a), (long)($b))")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): StrSliceExpr =
    copy(first = f, second = s, third = t)
}
