package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish pre-tokens: maximal runs matching
  * `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+` — implemented as a single linear
  * scan over the string's UTF-8 bytes instead of the regex engine
  * (`regexp_count` pays NFA stepping + match bookkeeping per token; this
  * pays one class lookup per byte). Byte-identical to the regex count:
  * ASCII letters/digits are their own classes, Java `\s` is
  * `[ \t\n\x0B\f\r]` (all ASCII), and every other byte — including every
  * byte of a multi-byte UTF-8 char — falls in the "other" run class, which
  * merges runs exactly like the regex's `[^A-Za-z0-9\s]+`. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeTokenCount.count($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  // 0 = whitespace, 1 = letter, 2 = digit, 3 = other
  private val classOf: Array[Byte] = {
    val t = Array.fill[Byte](256)(3)
    " \t\n\f\r\u000B".foreach(c => t(c.toInt) = 0) // Java \s incl. vertical tab
    ('A' to 'Z').foreach(c => t(c.toInt) = 1)
    ('a' to 'z').foreach(c => t(c.toInt) = 1)
    ('0' to '9').foreach(c => t(c.toInt) = 2)
    t
  }

  /** Static forwarder so generated code needs no reference object. */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var prev: Byte = 0
    var i = 0
    while (i < bytes.length) {
      val cls = classOf(bytes(i) & 0xff)
      if (cls != 0 && cls != prev) n += 1
      prev = cls
      i += 1
    }
    n
  }
}
