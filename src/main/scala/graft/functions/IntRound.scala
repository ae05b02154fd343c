package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's numeric→integer cast rounding, dispatched on the INPUT type
  * (r10, found by the randomized query fuzzer on a fixture value of
  * exactly 98.5):
  *
  *  - DOUBLE/FLOAT → integer rounds HALF TO EVEN (IEEE rint: probed
  *    98.5→98, 99.5→100, 2.5→2, -98.5→-98);
  *  - DECIMAL → integer rounds HALF AWAY FROM ZERO (probed 98.5→99,
  *    -2.5→-3);
  *  - VARCHAR parses as a decimal, half away (probed '98.5'→99);
  *  - integral/boolean inputs pass through.
  *
  * The previous emission (`round(CAST(x AS DECIMAL(38,9)))`) applied the
  * half-away rule to EVERY input — a silent off-by-one on float/double
  * ties. This kernel returns DECIMAL(38,0); the outer CAST to the target
  * width keeps ANSI overflow semantics (duck errors on overflow too).
  * The `tryMode` twin returns NULL instead of erroring on unparseable
  * strings / NaN / infinities, feeding TRY_CAST. */
case class IntRoundExpr(child: Expression, tryMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String =
    if (tryMode) "graft_int_round_try" else "graft_int_round"
  override def nullable: Boolean = child.nullable || tryMode
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | StringType | BooleanType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} requires a numeric, string or boolean input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = {
    val r = IntRound.round(a, tryMode)
    if (r == null) null else Decimal(r, 38, 0)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("irTmp")
      // when nullable=false (non-null child, !tryMode) nullSafeCodeGen
      // never DECLARES ${ev.isNull} — referencing it emits uncompilable
      // Java and janino's failure silently drops the WHOLE projection to
      // interpreted execution (r14 FallbackAudit root cause, the "is not
      // an rvalue" class: 100 events/22 entries at HEAD~). The kernel
      // cannot return null on that path (round() throws instead), so
      // guard the assignment on nullability.
      val onNull = if (nullable) s"${ev.isNull} = true;"
        else "throw new IllegalStateException(\"graft_int_round: unexpected null\");"
      s"""java.math.BigDecimal $tmp = graft.functions.IntRound.round($a, $tryMode);
         |if ($tmp == null) { $onNull }
         |else { ${ev.value} = org.apache.spark.sql.types.Decimal.apply($tmp, 38, 0); }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): IntRoundExpr =
    copy(child = c)
}

object IntRound {
  /** null return = tryMode swallow; throws when !tryMode and the input
    * cannot convert (duck's loud CAST posture). */
  def round(a: Any, tryMode: Boolean): JBigDecimal = a match {
    case d: java.lang.Double => fp(d, tryMode)
    case f: java.lang.Float => fp(f.doubleValue(), tryMode)
    case dec: Decimal =>
      dec.toJavaBigDecimal.setScale(0, RoundingMode.HALF_UP)
    case s: UTF8String =>
      val t = s.toString.trim
      try fit(new JBigDecimal(t).setScale(0, RoundingMode.HALF_UP), tryMode)
      catch {
        case e: NumberFormatException =>
          if (tryMode) null
          else throw new NumberFormatException(
            s"cannot cast '$t' to an integer type: ${e.getMessage}")
      }
    case b: java.lang.Boolean => if (b) JBigDecimal.ONE else JBigDecimal.ZERO
    case b: java.lang.Byte => JBigDecimal.valueOf(b.longValue())
    case sh: java.lang.Short => JBigDecimal.valueOf(sh.longValue())
    case i: java.lang.Integer => JBigDecimal.valueOf(i.longValue())
    case l: java.lang.Long => JBigDecimal.valueOf(l.longValue())
    case other => throw new IllegalArgumentException(
      s"graft_int_round: unsupported input $other")
  }

  private def fp(d: Double, tryMode: Boolean): JBigDecimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) {
      if (tryMode) return null
      throw new ArithmeticException(s"cannot cast $d to an integer type")
    }
    // IEEE round-half-to-even, duck's DOUBLE->int rule
    fit(new JBigDecimal(Math.rint(d)), tryMode)
  }

  /** DECIMAL(38,0) cannot hold >38 digits — a TRY twin must NULL there
    * BEFORE Decimal.apply throws (the outer TRY_CAST never sees it). */
  private def fit(r: JBigDecimal, tryMode: Boolean): JBigDecimal =
    if (r.precision() - r.scale() > 38) {
      if (tryMode) null
      else throw new ArithmeticException(
        s"value $r out of range for an integer type")
    } else r
}
