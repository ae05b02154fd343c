package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's CAST(x AS DECIMAL(p,s)), dispatched on the INPUT type (r13
  * dec fuzz mode — probed matrix; Spark's Cast applies HALF_UP to every
  * source, a silent wrong answer on any downscale tie):
  *
  *  - DECIMAL → DECIMAL downscale TRUNCATES toward zero (probed:
  *    1.256→(8,1)→1.2, 2.555→(38,2)→2.55, -1.25→(8,1)→-1.2, 3.5→(8,0)→3
  *    — while Spark rounds HALF_UP: 1.3, 2.56, -1.3, 4);
  *  - DOUBLE/FLOAT → DECIMAL is duck's round() FP algorithm:
  *    std::round(x·10^s) half away from zero on the FLOATING-POINT
  *    product, the integral double then converting exactly (probed:
  *    2.5e0→(8,0)→3, -2.5e0→-3, and the knife edges 2.675e0→(10,2)→2.68
  *    — the product 267.5 after IEEE rounding — vs 0.145e0→0.14 — the
  *    product 14.499999…; Spark's shortest-rendering HALF_UP says 2.67
  *    and 0.15 there); NaN/inf error (try: NULL);
  *  - VARCHAR parses then rounds HALF UP (probed '1.255'→(8,2)→1.26);
  *  - integral/boolean inputs convert exactly.
  *
  * Out-of-range (integer digits > p-s) errors like duck's Conversion
  * Error ("value is out of range"); the `tryMode` twin returns NULL.
  * Result scale is always s, so VARCHAR rendering keeps duck's trailing
  * zeros. Emitted by the translator ONLY for casts whose operand slice
  * carries DECIMAL risk (the rewriteDivMod containment-scan convention);
  * a false positive lands on a non-decimal input branch here, each of
  * which reproduces duck's semantics for that source type. */
case class DecCastExpr(child: Expression, p: Int, s: Int, tryMode: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = DecimalType(p, s)
  override def prettyName: String =
    if (tryMode) "graft_dec_cast_try" else "graft_dec_cast"
  override def nullable: Boolean = child.nullable || tryMode
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | StringType | BooleanType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} requires a numeric, string or boolean input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = {
    val r = DecCast.cast(a, p, s, tryMode)
    if (r == null) null else Decimal(r, p, s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("dcTmp")
      s"""java.math.BigDecimal $tmp = graft.functions.DecCast.cast($a, $p, $s, $tryMode);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = org.apache.spark.sql.types.Decimal.apply($tmp, $p, $s); }
         |""".stripMargin
    })
  override protected def withNewChildInternal(c: Expression): DecCastExpr =
    copy(child = c)
}

object DecCast {
  /** null return = tryMode swallow; throws when !tryMode (duck's loud
    * Conversion Error posture). */
  def cast(a: Any, p: Int, s: Int, tryMode: Boolean): JBigDecimal = a match {
    case dec: Decimal =>
      // DECIMAL → DECIMAL: duck truncates extra scale digits
      fit(dec.toJavaBigDecimal.setScale(s, RoundingMode.DOWN), p, s, tryMode)
    case d: java.lang.Double => fp(d, p, s, tryMode)
    case f: java.lang.Float => fp(f.doubleValue(), p, s, tryMode)
    case str: UTF8String =>
      val t = str.toString.trim
      try fit(new JBigDecimal(t).setScale(s, RoundingMode.HALF_UP), p, s, tryMode)
      catch {
        case e: NumberFormatException =>
          if (tryMode) null
          else throw new NumberFormatException(
            s"""Casting value "$t" to type DECIMAL($p,$s) failed: ${e.getMessage}""")
      }
    case b: java.lang.Boolean =>
      fit((if (b) JBigDecimal.ONE else JBigDecimal.ZERO).setScale(s), p, s, tryMode)
    case b: java.lang.Byte => fit(JBigDecimal.valueOf(b.longValue(), 0).setScale(s), p, s, tryMode)
    case sh: java.lang.Short => fit(JBigDecimal.valueOf(sh.longValue(), 0).setScale(s), p, s, tryMode)
    case i: java.lang.Integer => fit(JBigDecimal.valueOf(i.longValue(), 0).setScale(s), p, s, tryMode)
    case l: java.lang.Long => fit(JBigDecimal.valueOf(l.longValue(), 0).setScale(s), p, s, tryMode)
    case other => throw new IllegalArgumentException(
      s"graft_dec_cast: unsupported input $other")
  }

  private def fp(d: Double, p: Int, s: Int, tryMode: Boolean): JBigDecimal = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) {
      if (tryMode) return null
      throw new ArithmeticException(
        s"""Casting value "$d" to type DECIMAL($p,$s) failed: value is out of range""")
    }
    // duck's double→DECIMAL is the SAME FP algorithm as its round()
    // (r13 full-gate rerun, queries9 probe 5): std::round(x·10^s) on the
    // FLOATING-POINT product, half away from zero, then the integral
    // double converts exactly. 2.675e0→(10,2)→2.68 because 2.675·100
    // rounds UP to 267.5 in IEEE — both the exact-binary expansion
    // (2.67) and Spark's shortest-rendering HALF_UP disagree with duck
    // on knife edges like this.
    val prod = d * Math.pow(10, s.toDouble)
    if (java.lang.Double.isInfinite(prod)) {
      if (tryMode) return null
      throw new ArithmeticException(
        s"""Casting value "$d" to type DECIMAL($p,$s) failed: value is out of range""")
    }
    // cround's result is an integral double — exact in binary, so the
    // BigDecimal conversion is the int128 narrowing duck performs
    fit(new JBigDecimal(RoundDbl.cround(prod)).movePointLeft(s).setScale(s),
      p, s, tryMode)
  }

  /** duck errors when the value's integer digits exceed p - s. */
  private def fit(r: JBigDecimal, p: Int, s: Int, tryMode: Boolean): JBigDecimal =
    if (r.precision() - r.scale() > p - s) {
      if (tryMode) null
      else throw new ArithmeticException(
        s"""Casting value "$r" to type DECIMAL($p,$s) failed: value is out of range""")
    } else r
}
