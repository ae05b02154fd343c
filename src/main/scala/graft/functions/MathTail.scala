package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Math-tail kernels (r10 batch 8): DuckDB builtins Spark lacks.
  * Probe-pinned on DuckDB 1.x: gamma(5)=24 (exact for integer args),
  * gamma(0.5)=1.772454, lgamma(10.5)=13.940625; gamma/lgamma of zero or
  * a negative integer ERRORS loudly ("cannot take gamma of zero") —
  * mirrored as a runtime exception, matching duck's loud posture. */
case class GammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "gamma"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gamma requires a numeric type, got ${other.simpleString}")
    }
  private def toD(a: Any): Double = a match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  override def nullSafeEval(a: Any): Any = MathTail.gamma(toD(a))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: DecimalType => nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.MathTail.gamma($a.toDouble());")
      case _ => nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.MathTail.gamma((double) $a);")
    }
  override protected def withNewChildInternal(c: Expression): GammaExpr = copy(child = c)
}

case class LgammaExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lgamma"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lgamma requires a numeric type, got ${other.simpleString}")
    }
  private def toD(a: Any): Double = a match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  override def nullSafeEval(a: Any): Any = MathTail.lgamma(toD(a))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case _: DecimalType => nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.MathTail.lgamma($a.toDouble());")
      case _ => nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.MathTail.lgamma((double) $a);")
    }
  override protected def withNewChildInternal(c: Expression): LgammaExpr = copy(child = c)
}

/** DuckDB bit_count counts set bits within the VALUE'S TYPE WIDTH —
  * bit_count(-1::TINYINT) = 8 where Spark's builtin promotes to 64 bits
  * (probe: 8 vs 64, a silent 8× divergence on narrow types). A custom
  * expression sees the child's resolved type at analysis, closing the
  * named-column case token-level rewriting cannot. */
case class BitCountWidth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bit_count"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | BooleanType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bit_count requires an integral type, got ${other.simpleString}")
    }
  private def mask: Long = child.dataType match {
    case ByteType => 0xffL
    case ShortType => 0xffffL
    case IntegerType => 0xffffffffL
    case BooleanType => 0x1L
    case _ => -1L
  }
  override def nullSafeEval(a: Any): Any = a match {
    case b: java.lang.Boolean => if (b) 1 else 0
    case n: Number => java.lang.Long.bitCount(n.longValue() & mask)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BooleanType =>
        nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $a ? 1 : 0;")
      case _ =>
        nullSafeCodeGen(ctx, ev, a =>
          s"${ev.value} = java.lang.Long.bitCount(((long) $a) & ${mask}L);")
    }
  override protected def withNewChildInternal(c: Expression): BitCountWidth = copy(child = c)
}

/** DuckDB typeof(): the duck spelling of the argument's type (probe:
  * INTEGER / DECIMAL(2,1) / VARCHAR / INTEGER[] / MAP(VARCHAR, INTEGER) /
  * STRUCT(a INTEGER) / '"NULL"'). Resolved entirely at analysis — the
  * codegen is a constant. */
case class DuckTypeOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_typeof"
  override def foldable: Boolean = true
  override def eval(input: InternalRow): Any =
    UTF8String.fromString(MathTail.duckTypeName(child.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // foldable + ignores the input row: ConstantFolding normally folds
    // this away before codegen; the body exists for completeness
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("duckType",
      UTF8String.fromString(MathTail.duckTypeName(child.dataType)))
    ev.copy(
      code = code"UTF8String ${ev.value} = $ref;",
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): DuckTypeOf = copy(child = c)
}

object MathTail {
  // Lanczos approximation, g = 7, 9 coefficients (~15 significant digits)
  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  private def lanczosLg(x: Double): Double = {
    val z = x - 1.0
    var s = lanczos(0)
    var i = 1
    while (i < 9) { s += lanczos(i) / (z + i); i += 1 }
    val t = z + 7.5
    0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(s)
  }

  private def checkPole(x: Double): Unit =
    if (x == math.floor(x) && x <= 0.0)
      throw new IllegalArgumentException(
        if (x == 0.0) "cannot take gamma of zero"
        else s"cannot take gamma of negative integer $x")

  def lgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    checkPole(x)
    if (x < 0.5)
      // reflection: ln|Γ(x)| = ln(π/|sin πx|) − lnΓ(1−x)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
    else lanczosLg(x)
  }

  def gamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    checkPole(x)
    // exact product for integer args (duck's tgamma is exact there; the
    // Lanczos exp() route would drift in the last ulp and print 24.000001)
    if (x == math.floor(x) && x > 0.0 && x <= 170.0) {
      var r = 1.0
      var k = 2
      while (k < x) { r *= k; k += 1 }
      r
    } else if (x < 0.5)
      math.Pi / (math.sin(math.Pi * x) * math.exp(lanczosLg(1.0 - x)))
    else math.exp(lanczosLg(x))
  }

  def duckTypeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case NullType => "\"NULL\""
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => duckTypeName(e) + "[]"
    case MapType(k, v, _) => s"MAP(${duckTypeName(k)}, ${duckTypeName(v)})"
    case StructType(fields) =>
      fields.map(f => s"${f.name} ${duckTypeName(f.dataType)}")
        .mkString("STRUCT(", ", ", ")")
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
        CalendarIntervalType => "INTERVAL"
    case other => other.sql
  }
}
