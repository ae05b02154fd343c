package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's text-rendering helpers `bar` and `format_bytes` (r7), probe-pinned
  * on DuckDB 1.0 (`/root/reference/main.py:231` delegates them to the engine;
  * they surface through the HTTP wire like any scalar).
  *
  * `bar(x, min, max, width)`: unicode block-element bar chart cell. Probed
  * semantics: fraction clamped to [0,1]; `width * fraction` block units;
  * full blocks '█' plus one partial eighth-block when `floor(rem*8) >= 1`
  * (" ▏▎▍▌▋▊▉"); then — the quirk a byte-exact twin must replicate — the
  * result is space-padded until its UTF-8 BYTE length reaches `width`
  * (each block char is 3 bytes, so bars near-full get little or no pad:
  * bar(0,0,10,10) is 10 spaces, bar(0.9999,0,10,10) is '▉' + 7 spaces).
  *
  * `format_bytes(n)`: binary units bytes/KiB/MiB/GiB/TiB/PiB, value
  * TRUNCATED toward zero to 1 decimal (2047 → '1.9 KiB', 1048570 →
  * '1023.9 KiB'), singular '1 byte'/'-1 byte', caps at PiB
  * (Long.MaxValue → '8191.9 PiB').
  */
case class GraftBar(first: Expression, second: Expression, third: Expression,
    fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bar"
  override def nullSafeEval(x: Any, mn: Any, mx: Any, w: Any): Any =
    BarFormat.bar(x.asInstanceOf[Number].doubleValue(),
      mn.asInstanceOf[Number].doubleValue(),
      mx.asInstanceOf[Number].doubleValue(),
      w.asInstanceOf[Number].doubleValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, mn, mx, w) =>
      s"${ev.value} = graft.functions.BarFormat.bar((double) $x, (double) $mn, (double) $mx, (double) $w);")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): GraftBar = copy(a, b, c, d)
}

case class GraftFormatBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "format_bytes"
  override def nullSafeEval(n: Any): Any =
    BarFormat.formatBytes(n.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"${ev.value} = graft.functions.BarFormat.formatBytes((long) $n);")
  override protected def withNewChildInternal(c: Expression): GraftFormatBytes =
    copy(child = c)
}

case class GraftFormatBytesDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "format_bytes_decimal"
  override def nullSafeEval(n: Any): Any =
    BarFormat.formatBytesDecimal(n.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"${ev.value} = graft.functions.BarFormat.formatBytesDecimal((long) $n);")
  override protected def withNewChildInternal(c: Expression): GraftFormatBytesDecimal =
    copy(child = c)
}

object BarFormat {
  private val Partials =
    Array("", "▏", "▎", "▍", "▌", "▋", "▊", "▉")

  def bar(x: Double, min: Double, max: Double, width: Double): UTF8String = {
    val span = max - min
    val frac =
      if (span <= 0 || x.isNaN) 0.0
      else math.min(1.0, math.max(0.0, (x - min) / span))
    val blocks = frac * width
    val full = math.floor(blocks).toInt
    val partialIdx = math.floor((blocks - full) * 8).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < full) { sb.append('█'); i += 1 }
    var chars = full
    if (partialIdx >= 1 && partialIdx <= 7) { sb.append(Partials(partialIdx)); chars += 1 }
    // DuckDB pads with spaces to the BYTE length `width` (blocks are 3-byte
    // UTF-8 chars) — replicated for hash parity, quirk and all
    var pad = math.max(0, width.toInt - 3 * chars)
    while (pad > 0) { sb.append(' '); pad -= 1 }
    UTF8String.fromString(sb.toString)
  }

  private val Units = Array("bytes", "KiB", "MiB", "GiB", "TiB", "PiB")

  def formatBytes(n: Long): UTF8String = {
    // integer magnitude/tenths math — a double would round Long.MaxValue
    // up to 8192.0 PiB where DuckDB truncates to 8191.9 (probe-pinned).
    // Long.MinValue: magnitude handled in BigInt-free form via Math.abs on
    // the DIVIDED value (|MinValue|/1024 fits a Long).
    if (n == Long.MinValue) // |MinValue| overflows; exactly -8 Ki PiB
      return UTF8String.fromString("-8192.0 PiB")
    val av = math.abs(n)
    if (av < 1024L) {
      val s = if (av == 1L) s"$n byte" else s"$n bytes"
      return UTF8String.fromString(s)
    }
    val sign = if (n < 0) "-" else ""
    var k = 1
    var unit = 1024L
    while (k < 5 && av >= unit * 1024L) { k += 1; unit *= 1024L }
    val whole = av / unit
    // tenths digit = floor(rem * 10 / unit): rem < 2^50, *10 fits a Long
    val tenth = av % unit * 10L / unit
    UTF8String.fromString(s"$sign$whole.$tenth ${Units(k)}")
  }

  private val DecUnits = Array("bytes", "kB", "MB", "GB", "TB", "PB")

  /** DuckDB formatReadableDecimalSize: base-1000 units, same truncated
    * 1-decimal integer math (probe: 999999 → '999.9 kB', -2500 →
    * '-2.5 kB', 1 → '1 byte'). */
  def formatBytesDecimal(n: Long): UTF8String = {
    if (n == Long.MinValue) return UTF8String.fromString("-9223.3 PB")
    val av = math.abs(n)
    if (av < 1000L) {
      val s = if (av == 1L) s"$n byte" else s"$n bytes"
      return UTF8String.fromString(s)
    }
    val sign = if (n < 0) "-" else ""
    var k = 1
    var unit = 1000L
    while (k < 5 && av >= unit * 1000L) { k += 1; unit *= 1000L }
    val whole = av / unit
    val tenth = av % unit * 10L / unit
    UTF8String.fromString(s"$sign$whole.$tenth ${DecUnits(k)}")
  }
}
