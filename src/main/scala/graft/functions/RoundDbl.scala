package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DuckDB's round() over DOUBLE/FLOAT (r13 dec fuzz, num-mode probe 34):
  * duck computes `std::round(x * 10^n) / 10^n` — half-away-from-zero on
  * the FLOATING-POINT product — while Spark rounds the value's shortest
  * decimal rendering through BigDecimal.HALF_UP. The two disagree on
  * every binary knife-edge (probed matrix, all duck 1.0 values:
  * round(2.675e0, 2) = 2.68 because 2.675·100 rounds UP to 267.5 in
  * IEEE, round(0.145e0, 2) = 0.14 because 0.145·100 = 14.499999…,
  * round(167634154485.89804, 4) = ….8981 where BigDecimal says ….8980).
  * Negative precision divides first (`round(x / 10^-n) * 10^-n`); the
  * overflow/NaN guards mirror duck's: positive-branch overflow returns
  * the INPUT (round(1.5e300, 2) = 1.5e300, round(nan, 2) = nan),
  * negative-branch overflow returns 0 (round(nan, -2) = 0 — the r12
  * CASE guard this kernel subsumes). Integral inputs convert to double
  * like duck (typeof(round(5, 1)) = DOUBLE). DECIMAL operands never
  * route here — the translator keeps Spark's decimal round, which
  * matches duck's exact half-away on decimals (r12-pinned). */
case class RoundDblExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_round_dbl"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: NumericType | NullType,
          ByteType | ShortType | IntegerType | LongType | NullType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_round_dbl requires (numeric, integral) inputs, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a match {
      case d: Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    RoundDbl.round(x, b.asInstanceOf[Number].intValue())
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ad = left.dataType match {
        case _: DecimalType => s"$a.toDouble()"
        case _ => s"(double)($a)"
      }
      s"${ev.value} = graft.functions.RoundDbl.round($ad, (int)($b));"
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RoundDblExpr =
    copy(left = l, right = r)
}

object RoundDbl {
  /** exact C std::round: half away from zero, no double-rounding (the
    * floor(x + 0.5) idiom rounds 0.49999999999999994 wrongly up).
    * Shared with [[DecCast]] — duck's double→DECIMAL cast uses the same
    * FP product rounding. */
  def cround(v: Double): Double = {
    val a = Math.abs(v)
    val f = Math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    Math.copySign(r, v)
  }

  def round(x: Double, n: Int): Double =
    if (n < 0) {
      val modifier = Math.pow(10, -n.toDouble)
      val rounded = cround(x / modifier) * modifier
      if (java.lang.Double.isInfinite(rounded) || java.lang.Double.isNaN(rounded)) 0.0
      else rounded
    } else {
      val modifier = Math.pow(10, n.toDouble)
      val rounded = cround(x * modifier) / modifier
      if (java.lang.Double.isInfinite(rounded) || java.lang.Double.isNaN(rounded)) x
      else rounded
    }
}
