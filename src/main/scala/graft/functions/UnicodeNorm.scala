package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's unicode normalizers (r7 session 3), probe-pinned on 1.0:
  * `strip_accents('héllo ünïcodé ñ ß')` = 'hello unicode n ß' (combining
  * marks removed after canonical decomposition; ß has no decomposition and
  * survives) and `nfc_normalize` = canonical composition. Both are the
  * standard ICU behaviors, reproduced here with java.text.Normalizer —
  * same Unicode canonical data, so outputs agree codepoint-for-codepoint.
  * ASCII fast path: no allocation when no normalization can apply.
  */
case class StripAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"
  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeNorm.stripAccents($s);")
  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfcNormalize(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeNorm.nfcNormalize($s);")
  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** DuckDB `chr(n)`: full Unicode codepoint → string. Spark's chr/char cut
  * the argument to 256 (ASCII), silently mangling any codepoint above —
  * chr(233) is 'é' in DuckDB but 'é'-less garbage through Spark's. */
case class ChrCodepoint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "chr"
  override def nullSafeEval(n: Any): Any =
    UnicodeNorm.chr(n.asInstanceOf[Number].longValue())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, n =>
      s"${ev.value} = graft.functions.UnicodeNorm.chr((long) $n);")
  override protected def withNewChildInternal(c: Expression): ChrCodepoint =
    copy(child = c)
}

object UnicodeNorm {
  def chr(n: Long): UTF8String =
    UTF8String.fromString(new String(Character.toChars(n.toInt)))

  private def isAscii(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return false; i += 1 }
    true
  }

  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s.getBytes)) return s
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val ch = decomposed.charAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def nfcNormalize(s: UTF8String): UTF8String = {
    if (isAscii(s.getBytes)) return s
    UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.NFC))
  }
}
