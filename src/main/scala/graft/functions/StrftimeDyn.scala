package graft.functions

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.TextStyle
import java.time.temporal.IsoFields
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime DuckDB strftime for DYNAMIC (non-literal) patterns (r12,
  * closing the last strftime register entry): literal patterns translate
  * at rewrite time via scanStrftime's JDK mapping; a pattern COLUMN used
  * to fail loudly in Spark's analyzer. This formatter mirrors
  * scanStrftime's probe-pinned specifier semantics exactly (duck 1.x):
  * %-X unpadded variants, %z = '+00' and %Z = '' on naive timestamps,
  * %u ISO weekday / %w 0=Sunday, %V ISO week + %G ISO year, %U/%W
  * C-grid week numbers, %f micros / %g millis / %n nanos, %c/%x/%X/%T
  * composites, %% literal. Unknown specifiers throw — duck errors on
  * them too ("Failed to parse format specifier"). Dynamic strPtime
  * (parsing) remains loud — register entry narrowed to the parse
  * direction. */
object StrftimeDyn {
  def format(micros: Long, pattern: UTF8String): UTF8String = {
    val dt = LocalDateTime.ofEpochSecond(
      java.lang.Math.floorDiv(micros, 1000000L),
      (java.lang.Math.floorMod(micros, 1000000L) * 1000L).toInt,
      ZoneOffset.UTC)
    val p = pattern.toString
    val sb = new java.lang.StringBuilder(p.length + 16)
    def pad(v: Long, w: Int): String = {
      val s = math.abs(v).toString
      val sign = if (v < 0) "-" else ""
      sign + ("0" * math.max(0, w - s.length)) + s
    }
    val isoDow = dt.getDayOfWeek.getValue // Mon=1..Sun=7
    val dow0 = isoDow % 7 // Sun=0..Sat=6
    def spec(c: Char, dash: Boolean): Unit = c match {
      case '%' if !dash => sb.append('%')
      case 'Y' => sb.append(pad(dt.getYear.toLong, 4))
      case 'y' =>
        val yy = java.lang.Math.floorMod(dt.getYear.toLong, 100L)
        sb.append(if (dash) yy.toString else pad(yy, 2))
      case 'm' => sb.append(if (dash) dt.getMonthValue.toString else pad(dt.getMonthValue.toLong, 2))
      case 'd' => sb.append(if (dash) dt.getDayOfMonth.toString else pad(dt.getDayOfMonth.toLong, 2))
      case 'H' => sb.append(if (dash) dt.getHour.toString else pad(dt.getHour.toLong, 2))
      case 'I' =>
        val h12 = ((dt.getHour + 11) % 12) + 1
        sb.append(if (dash) h12.toString else pad(h12.toLong, 2))
      case 'M' => sb.append(if (dash) dt.getMinute.toString else pad(dt.getMinute.toLong, 2))
      case 'S' => sb.append(if (dash) dt.getSecond.toString else pad(dt.getSecond.toLong, 2))
      case 'j' => sb.append(if (dash) dt.getDayOfYear.toString else pad(dt.getDayOfYear.toLong, 3))
      case 'f' if !dash => sb.append(pad(dt.getNano / 1000L, 6))
      case 'g' if !dash => sb.append(pad(dt.getNano / 1000000L, 3))
      case 'n' if !dash => sb.append(pad(dt.getNano / 1000L, 6)).append("000")
      case 'p' if !dash => sb.append(if (dt.getHour < 12) "AM" else "PM")
      case 'a' if !dash =>
        sb.append(dt.getDayOfWeek.getDisplayName(TextStyle.SHORT, Locale.US))
      case 'A' if !dash =>
        sb.append(dt.getDayOfWeek.getDisplayName(TextStyle.FULL, Locale.US))
      case 'b' | 'h' if !dash =>
        sb.append(dt.getMonth.getDisplayName(TextStyle.SHORT, Locale.US))
      case 'B' if !dash =>
        sb.append(dt.getMonth.getDisplayName(TextStyle.FULL, Locale.US))
      case 'c' if !dash =>
        spec('Y', false); sb.append('-'); spec('m', false); sb.append('-')
        spec('d', false); sb.append(' '); spec('T', false)
      case 'x' if !dash =>
        spec('Y', false); sb.append('-'); spec('m', false); sb.append('-')
        spec('d', false)
      case 'X' | 'T' if !dash =>
        spec('H', false); sb.append(':'); spec('M', false); sb.append(':')
        spec('S', false)
      case 'z' if !dash => sb.append("+00")
      case 'Z' if !dash => () // duck prints '' (no tz name on naive ts)
      case 'u' if !dash => sb.append(isoDow.toString)
      case 'w' if !dash => sb.append(dow0.toString)
      case 'V' if !dash =>
        sb.append(pad(dt.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR).toLong, 2))
      case 'G' if !dash => sb.append(dt.get(IsoFields.WEEK_BASED_YEAR).toString)
      case 'U' if !dash =>
        sb.append(pad(((dt.getDayOfYear + 6 - dow0) / 7).toLong, 2))
      case 'W' if !dash =>
        sb.append(pad(((dt.getDayOfYear + 6 - (dow0 + 6) % 7) / 7).toLong, 2))
      case other => throw new IllegalArgumentException(
        s"graft_strftime: unrecognized format specifier %${if (dash) "-" else ""}$other (DuckDB errors on it too)")
    }
    var i = 0
    while (i < p.length) {
      if (p.charAt(i) == '%') {
        // a trailing '%' or '%-' has no specifier — duck rejects both as
        // parse errors; emitting them literally (pre-r13) was a silent
        // permissive divergence (r12 ADVICE)
        if (i + 1 >= p.length) throw new IllegalArgumentException(
          "graft_strftime: trailing '%' without a format specifier (DuckDB errors on it too)")
        val dash = p.charAt(i + 1) == '-'
        if (dash && i + 2 >= p.length) throw new IllegalArgumentException(
          "graft_strftime: trailing '%-' without a format specifier (DuckDB errors on it too)")
        val c = if (dash) p.charAt(i + 2) else p.charAt(i + 1)
        i += (if (dash) 3 else 2)
        spec(c, dash)
      } else { sb.append(p.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `graft_strftime(ts_or_date, pattern)` — see [[StrftimeDyn]]. */
case class StrftimeDynExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strftime"
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (TimestampType | TimestampNTZType | DateType, StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_strftime requires (timestamp/date, string), got (${l.simpleString}, ${r.simpleString})")
  }
  private def micros(v: Any): Long = left.dataType match {
    case DateType => v.asInstanceOf[Int].toLong * 86400000000L
    case _ => v.asInstanceOf[Long]
  }
  override protected def nullSafeEval(t: Any, p: Any): Any =
    StrftimeDyn.format(micros(t), p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    left.dataType match {
      case DateType =>
        defineCodeGen(ctx, ev, (t, p) =>
          s"graft.functions.StrftimeDyn.format(((long)($t)) * 86400000000L, $p)")
      case _ =>
        defineCodeGen(ctx, ev, (t, p) =>
          s"graft.functions.StrftimeDyn.format((long)($t), $p)")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): StrftimeDynExpr =
    copy(left = l, right = r)
}
