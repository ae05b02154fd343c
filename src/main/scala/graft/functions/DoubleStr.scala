package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's DOUBLE/FLOAT → VARCHAR rendering (r13 dec fuzz, probe 34):
  * shortest round-trip digits, PLAIN decimal notation while the decimal
  * exponent is in [-4, 15] (integral values keep a trailing ".0"), and
  * `d[.ddd]e±XX` scientific outside it (two-digit minimum exponent,
  * mantissa dot only when more than one digit). Spark's Cast uses Java's
  * Double.toString, which flips to `1.23456785E7` at 1e7 — a silent
  * rendering divergence in every double→string cast of large values.
  * Probed matrix: 99999999.99→'99999999.99', 1e15→'1000000000000000.0',
  * 1e16→'1e+16', 0.0001→'0.0001', 1.5e-5→'1.5e-05', 2.0→'2.0',
  * -0.0→'0.0', nan→'nan', inf→'inf'. FLOAT takes duck's Grisu3-binary32
  * digits ([[Grisu32]]): float-shortest when grisu certifies (~99.3% of
  * values) and the widened DOUBLE's shortest digits on certification
  * failure (duck '3809327.75' where float-shortest says '3809327.8' —
  * 160k-render sweeps match duck bit-for-bit). Installed by the
  * [[graft.plans.DoubleCastToDuckStr]] optimizer rule; constant-only
  * casts fold before that rule runs and keep Spark's rendering
  * (documented residual — every column-bearing path is covered). */
case class DoubleStrExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_double_str"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_double_str requires a double or float input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = a match {
    case d: java.lang.Double => UTF8String.fromString(DoubleStr.fmt(d, isFloat = false))
    case f: java.lang.Float =>
      UTF8String.fromString(DoubleStr.fmt(f.doubleValue(), isFloat = true, f = f))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case FloatType => defineCodeGen(ctx, ev, x =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.DoubleStr.fmtFloat($x))")
      case _ => defineCodeGen(ctx, ev, x =>
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.functions.DoubleStr.fmtDouble($x))")
    }
  override protected def withNewChildInternal(c: Expression): DoubleStrExpr =
    copy(child = c)
}

object DoubleStr {
  def fmtDouble(d: Double): String = fmt(d, isFloat = false)
  def fmtFloat(f: Float): String = fmt(f.toDouble, isFloat = true, f = f)

  def fmt(d: Double, isFloat: Boolean, f: Float = 0f): String = {
    if (java.lang.Double.isNaN(d)) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    // signed zero: a TRUE double -0.0 renders '-0.0' in duck (r14
    // 20k-render sweep; the r13 '0.0' pin probed the LITERAL -0.0,
    // which reaches DOUBLE via DECIMAL and loses the sign)
    if (d == 0.0) {
      return if (java.lang.Double.doubleToRawLongBits(d) != 0L) "-0.0" else "0.0"
    }
    val neg = d < 0
    if (isFloat) {
      // duck's FLOAT path is fmt's grisu3-binary32: float-shortest when
      // certification succeeds (~99.3% of values), otherwise the digits
      // of the WIDENED DOUBLE (r14 sweep — 283/40k random floats take
      // the fallback; rendering plain float-shortest mismatched exactly
      // those, e.g. duck '3809327.75' vs shortest '3809327.8')
      Grisu32.shortest(Math.abs(f)) match {
        case Some((digits, pexp)) =>
          return layout(neg, digits, digits.length - 1 + pexp)
        case None =>
          return fmt(Math.abs(f).toDouble, isFloat = false) match {
            case s if neg => "-" + s
            case s => s
          }
      }
    }
    // shortest round-trip digits at the value's own width. Java's
    // toString is only GUARANTEED shortest on JDK 19+ (JDK-4511638) —
    // on this JDK 17 ~0.3% of doubles (mostly 1e17–1e19) render one
    // digit long (r13 ADVICE, verified vs duck: Java
    // '-2.6814475343671142e+18' vs duck '-2.681447534367114e+18'), so
    // the repr is minimized below by dropping trailing significand
    // digits while the result still round-trips to the same value.
    // (isFloat never reaches here — the grisu branch above returns for
    // every float, its fallback re-entering with isFloat=false)
    val repr = java.lang.Double.toString(Math.abs(d))
    // stripTrailingZeros: Java renders 1e16 as "1.0E16" — the mantissa
    // zero would leak into the scientific form as "1.0e+16" (duck: 1e+16)
    val bd = shorten(new java.math.BigDecimal(repr).stripTrailingZeros(),
      Math.abs(d), isFloat = false)
    val digits = bd.unscaledValue().toString
    val x = digits.length - 1 - bd.scale() // value = D[0].D[1:] * 10^x
    layout(neg, digits, x)
  }

  /** duck's layout over (digits, scientific exponent x): plain decimal
    * notation while x ∈ [-4, 15] (integral values keep a trailing
    * ".0"), `d[.ddd]e±XX` outside (two-digit minimum exponent). */
  private def layout(neg: Boolean, digits: String, x: Int): String = {
    val sb = new java.lang.StringBuilder(if (neg) "-" else "")
    if (x >= -4 && x <= 15) {
      if (x >= digits.length - 1) {
        sb.append(digits)
        var i = digits.length - 1
        while (i < x) { sb.append('0'); i += 1 }
        sb.append(".0")
      } else if (x >= 0) {
        sb.append(digits, 0, x + 1).append('.')
          .append(digits, x + 1, digits.length)
      } else {
        sb.append("0.")
        var i = -1
        while (i > x) { sb.append('0'); i -= 1 }
        sb.append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1)
        sb.append('.').append(digits, 1, digits.length)
      sb.append('e').append(if (x < 0) '-' else '+')
      val ax = Math.abs(x)
      if (ax < 10) sb.append('0')
      sb.append(ax)
    }
    sb.toString
  }

  /** Drop significand digits while a shorter decimal still parses back
    * to the same value, choosing the round-tripping candidate closest to
    * the exact binary value (Ryu's selection rule). One pass usually
    * no-ops — Java's repr is already shortest for >99% of values — so
    * the common-path cost is three BigDecimal rounds + parses. */
  private def shorten(bd0: java.math.BigDecimal, abs: Double,
      isFloat: Boolean): java.math.BigDecimal = {
    def trips(c: java.math.BigDecimal): Boolean =
      if (isFloat) java.lang.Float.parseFloat(c.toString) == abs.toFloat
      else java.lang.Double.parseDouble(c.toString) == abs
    val exact = new java.math.BigDecimal(abs) // exact binary expansion
    var bd = bd0
    var improved = true
    while (improved && bd.precision() > 1) {
      improved = false
      val p = bd.precision() - 1
      val cands = Seq(java.math.RoundingMode.HALF_EVEN,
          java.math.RoundingMode.FLOOR, java.math.RoundingMode.CEILING)
        .map(m => bd.round(new java.math.MathContext(p, m)))
        .distinct.filter(trips)
      if (cands.nonEmpty) {
        bd = cands.minBy(_.subtract(exact).abs()).stripTrailingZeros()
        improved = true
      }
    }
    // closest-at-final-precision (Ryu's second rule): Java's repr
    // guarantees round-trip, not closeness — when a same-precision
    // NEIGHBOR also round-trips (both inside the double's half-ulp
    // interval), duck emits the one closest to the exact value (r14
    // sweep: -3.6769268034656067e+25 where Java said …66e+25)
    val ulp = java.math.BigDecimal.valueOf(1L, bd.scale())
    val best = Seq(bd, bd.add(ulp), bd.subtract(ulp))
      .filter(c => c.precision() <= bd.precision() && c.signum() > 0 && trips(c))
      .minBy(_.subtract(exact).abs())
    best.stripTrailingZeros()
  }
}
