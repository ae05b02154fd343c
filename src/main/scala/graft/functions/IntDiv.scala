package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DuckDB's `//` operator (r12 num fuzz — probed matrix):
  *
  *   - both operands INTEGRAL → integer division TRUNCATED TOWARD ZERO
  *     (-7 // 2 = -3), computed exactly on longs (no double round-trip:
  *     9007199254740993 // 2 = 4503599627370496 exactly);
  *   - any FLOAT/DOUBLE/DECIMAL operand → PLAIN double division
  *     (probed: 7.5 // 2 = 3.75, 2.5 // 2 = 1.25 — duck's `//` is not
  *     floor division outside the integer-integer case);
  *   - divisor zero → NULL in every combination (5 // 0, 7.5e0 // 0,
  *     2.5 // 0 all NULL).
  *
  * Replaces the r4 `//` → DIV emission, which was integral-only (a
  * DOUBLE operand was a loud BINARY_OP_DIFF_TYPES) and raised
  * DIVIDE_BY_ZERO under ANSI where duck answers NULL. */
case class IntDivExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType | NullType => true
    case _ => false
  }
  private val integralPair = isIntegral(left.dataType) && isIntegral(right.dataType)
  override def dataType: DataType =
    if (integralPair) LongType else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_intdiv"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumeric(left.dataType) && isNumeric(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intdiv requires numeric operands, got " +
        s"${left.dataType.simpleString} // ${right.dataType.simpleString}")
  private def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (integralPair) {
      val d = b.asInstanceOf[Number].longValue()
      val n = a.asInstanceOf[Number].longValue()
      // Long.MinValue / -1 wraps in Java two's complement; duck raises
      // an out-of-range error for the pair (r12 ADVICE) — stay loud
      if (d == -1L && n == Long.MinValue) throw new ArithmeticException(
        "graft_intdiv: bigint out of range (-9223372036854775808 // -1 overflows; DuckDB errors too)")
      if (d == 0L) null else n / d
    } else {
      val d = toD(b)
      if (d == 0.0) null else toD(a) / d
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (integralPair)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""if ((long)($b) == 0L) { ${ev.isNull} = true; }
           |else if ((long)($b) == -1L && (long)($a) == java.lang.Long.MIN_VALUE) {
           |  throw new ArithmeticException(
           |    "graft_intdiv: bigint out of range (-9223372036854775808 // -1 overflows; DuckDB errors too)");
           |} else { ${ev.value} = ((long)($a)) / ((long)($b)); }
           |""".stripMargin
      })
    else {
      def asD(v: String, t: DataType): String = t match {
        case _: DecimalType => s"$v.toDouble()"
        case _ => s"(double)($v)"
      }
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val bd = asD(b, right.dataType)
        val ad = asD(a, left.dataType)
        s"""if ($bd == 0.0) { ${ev.isNull} = true; }
           |else { ${ev.value} = $ad / $bd; }
           |""".stripMargin
      })
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDivExpr =
    copy(left = l, right = r)
}

/** DuckDB's `//` for HUGEINT-SPELLED operands (r13 dec fuzz): duck's
  * HUGEINT `//` is EXACT INT128 division truncated toward zero
  * (99999999999999999999999 // -7 = -14285714285714285714285 exactly),
  * while its DECIMAL `//` is plain double division — and the engine's
  * HUGEINT → DECIMAL(38,0) type mapping erases that distinction at the
  * type level, so the TRANSLATOR picks this kernel when an operand slice
  * spells HUGEINT/UBIGINT or a >19-digit integer literal and carries no
  * other DECIMAL risk ([[IntDivExpr]]'s double path was a silent
  * precision loss past 2^53 there, and its fractional remainders
  * propagated through nested `//` chains where duck's stay integral).
  *
  * Type-dispatched fallbacks keep mis-routed slices duck-faithful: a
  * FLOAT/DOUBLE operand (an untyped column the token scan cannot see)
  * or a scaled DECIMAL means duck would NOT have seen two hugeints —
  * plain double division, exactly [[IntDivExpr]]'s non-integral arm.
  * Exact arm: both operands integral or DECIMAL scale 0 → BigDecimal
  * divideToIntegralValue (trunc toward zero), DECIMAL(38,0) result,
  * divisor zero → NULL. |a // b| ≤ |a| < 10^38, so the result always
  * fits. */
case class IntDivExactExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isExactSide(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | NullType => true
    case d: DecimalType => d.scale == 0
    case _ => false
  }
  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType | NullType => true
    case _ => false
  }
  private val exactPair = isExactSide(left.dataType) && isExactSide(right.dataType)
  override def dataType: DataType =
    if (exactPair) DecimalType(38, 0) else DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_intdiv_exact"
  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumeric(left.dataType) && isNumeric(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_intdiv_exact requires numeric operands, got " +
        s"${left.dataType.simpleString} // ${right.dataType.simpleString}")
  private def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (exactPair) {
      val r = IntDivExact.div(a, b)
      if (r == null) null else Decimal(r, 38, 0)
    } else {
      val d = toD(b)
      if (d == 0.0) null else toD(a) / d
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (exactPair)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("ideTmp")
        s"""java.math.BigDecimal $tmp =
           |  graft.functions.IntDivExact.div($a, $b);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = org.apache.spark.sql.types.Decimal.apply($tmp, 38, 0); }
           |""".stripMargin
      })
    else {
      def asD(v: String, t: DataType): String = t match {
        case _: DecimalType => s"$v.toDouble()"
        case _ => s"(double)($v)"
      }
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val bd = asD(b, right.dataType)
        val ad = asD(a, left.dataType)
        s"""if ($bd == 0.0) { ${ev.isNull} = true; }
           |else { ${ev.value} = $ad / $bd; }
           |""".stripMargin
      })
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntDivExactExpr =
    copy(left = l, right = r)
}

object IntDivExact {
  private def toJbd(v: Any): java.math.BigDecimal = v match {
    case d: Decimal => d.toJavaBigDecimal
    case n: Number => java.math.BigDecimal.valueOf(n.longValue())
  }
  /** trunc-toward-zero integral quotient; null on zero divisor. */
  def div(a: Any, b: Any): java.math.BigDecimal = {
    val d = toJbd(b)
    if (d.signum() == 0) null
    else toJbd(a).divideToIntegralValue(d).setScale(0)
  }
}

/** DuckDB sign(): INTEGER -1/0/1 with sign(NaN) = 0 (probed). A SQL CASE
  * emission was tried first (r12 num fuzz) and was non-idempotent: the
  * int-cast rounding pass wrapped the CASE head on re-translation, and
  * Spark orders NaN above zero so the naive CASE said 1. Kernel keeps
  * the translate fixpoint (GRAFT_SIGN sits in integralFns) and the exact
  * duck matrix. */
case class SignExpr(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sign"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sign requires a numeric input, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = v match {
    case d: java.lang.Double =>
      if (d.isNaN) 0 else java.lang.Math.signum(d).toInt
    case f: java.lang.Float =>
      if (f.isNaN) 0 else java.lang.Math.signum(f.toDouble).toInt
    case dec: Decimal => dec.toJavaBigDecimal.signum()
    case n: Number => java.lang.Long.signum(n.longValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev, x =>
          s"(Double.isNaN((double)($x)) ? 0 : (int) Math.signum((double)($x)))")
      case _: DecimalType =>
        defineCodeGen(ctx, ev, x => s"$x.toJavaBigDecimal().signum()")
      case _ =>
        defineCodeGen(ctx, ev, x => s"java.lang.Long.signum((long)($x))")
    }
  override protected def withNewChildInternal(c: Expression): SignExpr =
    copy(child = c)
}

/** DuckDB abs() via literal-typing parity (r13, closing the r12 num-mode
  * allowlist residual): duck's parser types `-2147483648` as BIGINT
  * (integer literals get the narrowest fitting type ≥ INTEGER only up
  * to int32 RANGE — past it they widen), so `abs(-2147483648)` is a
  * BIGINT 2147483648 where Spark types the literal INT and its ANSI abs
  * overflows loudly. Width-reading kernel (the BitCountWidth
  * precedent): BYTE/SHORT/INT inputs return the next-wider type so the
  * type-min is always representable; LONG keeps LONG with an explicit
  * overflow throw at Long.MinValue (duck errors there too — probed:
  * `abs(CAST(… AS BIGINT))` min is "Out of Range"). For a TYPED column
  * at its type-min duck errors where this widens — permissive-superset,
  * error-path only (the value duck would have produced on the next
  * wider type is what we return). FLOAT/DOUBLE/DECIMAL pass through at
  * their own type. */
case class AbsWidthExpr(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = child.dataType match {
    case ByteType | ShortType => IntegerType
    case IntegerType => LongType
    case other => other
  }
  override def prettyName: String = "graft_abs"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_abs requires a numeric input, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = v match {
    case d: java.lang.Double => java.lang.Math.abs(d.doubleValue())
    case f: java.lang.Float => java.lang.Math.abs(f.floatValue())
    case dec: Decimal => if (dec.toJavaBigDecimal.signum() < 0) -dec else dec
    case b: java.lang.Byte => java.lang.Math.abs(b.toInt)
    case s: java.lang.Short => java.lang.Math.abs(s.toInt)
    case i: java.lang.Integer => java.lang.Math.abs(i.toLong)
    case l: java.lang.Long =>
      if (l.longValue() == Long.MinValue) throw new ArithmeticException(
        "graft_abs: bigint out of range (abs(-9223372036854775808) overflows; DuckDB errors too)")
      else java.lang.Math.abs(l.longValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case DoubleType | FloatType =>
        defineCodeGen(ctx, ev, x => s"java.lang.Math.abs($x)")
      case _: DecimalType =>
        defineCodeGen(ctx, ev,
          x => s"(($x.toJavaBigDecimal().signum() < 0) ? $x.unary_$$minus() : $x)")
      case ByteType | ShortType =>
        defineCodeGen(ctx, ev, x => s"java.lang.Math.abs((int)($x))")
      case IntegerType =>
        defineCodeGen(ctx, ev, x => s"java.lang.Math.abs((long)($x))")
      case _ =>
        nullSafeCodeGen(ctx, ev, x =>
          s"""if ((long)($x) == java.lang.Long.MIN_VALUE) {
             |  throw new ArithmeticException(
             |    "graft_abs: bigint out of range (abs(-9223372036854775808) overflows; DuckDB errors too)");
             |}
             |${ev.value} = java.lang.Math.abs((long)($x));
             |""".stripMargin)
    }
  override protected def withNewChildInternal(c: Expression): AbsWidthExpr =
    copy(child = c)
}
