package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's reverse() over VARCHAR reverses GRAPHEME CLUSTERS
  * (utf8proc), not codepoints — r14 str fuzz: reverse of the DECOMPOSED
  * 'café' (e + U+0301) keeps the accent on its base ('éfac'), where
  * Spark's codepoint reversal strands the combining mark at the front
  * ('́efac'). Installed by [[graft.plans.StringReverseGrapheme]] for
  * string inputs only — array reverse keeps Spark's native expression.
  * ASCII and precomposed inputs are unchanged (a cluster = a codepoint
  * there, so the r13 scout pin reverse('ab😀c') still holds). */
case class GraphemeReverseExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_reverse"
  override def nullSafeEval(a: Any): Any =
    UTF8String.fromString(
      GraphemeReverse.reverse(a.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GraphemeReverse.reverse($a.toString()))")
  override protected def withNewChildInternal(c: Expression): GraphemeReverseExpr =
    copy(child = c)
}

object GraphemeReverse {
  /** Static forwarder for generated code: UAX#29 cluster walk via
    * java.text.BreakIterator, appended back-to-front. */
  def reverse(s: String): String = {
    if (s.length <= 1) return s
    val it = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    it.setText(s)
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var b = it.next()
    while (b != java.text.BreakIterator.DONE) { bounds += b; b = it.next() }
    val sb = new java.lang.StringBuilder(s.length)
    var i = bounds.length - 1
    while (i > 0) { sb.append(s, bounds(i - 1), bounds(i)); i -= 1 }
    sb.toString
  }
}
