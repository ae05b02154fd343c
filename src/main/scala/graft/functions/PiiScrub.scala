package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII scrub kernel: returns
  * `array(scrubbed_text, email_count, phone_count)` (counts as strings —
  * a uniform array avoids struct plumbing; callers cast).
  *
  * Replaces four regex passes ([[graft.operators.TextAnalysis.scrubPii]]
  * plus two `regexp_extract_all` counts) with linear byte scans. The
  * scanner replicates the JDK engine's leftmost-first greedy semantics
  * for the two patterns EXACTLY (property-checked against the regex
  * implementation on random strings, ExpressionsSpec):
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: for each
  *    `@`, the local part is the maximal A-class run ending at it
  *    (clipped at the scan position); the greedy domain backtracks to the
  *    RIGHTMOST dot inside the maximal B-class run that is followed by
  *    ≥2 letters, and the match ends after that maximal letter run.
  *  - phone `\+?[0-9][0-9 ()-]{5,}[0-9]`: optional `+` then a digit; the
  *    greedy `{5,}` backtracks to the RIGHTMOST digit in the maximal
  *    C-class run at distance ≥ 6 from the first digit.
  *
  * Counts are over the ORIGINAL text for both patterns; the scrubbed
  * text applies email replacement first, then phone over the result —
  * exactly the declared p26 semantics. All pattern characters are ASCII,
  * so byte-level scanning matches the char-level engines (multi-byte
  * UTF-8 bytes are ≥ 0x80 and belong to no class).
  */
case class PiiScrub(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "pii_scrub"

  override def nullSafeEval(input: Any): Any =
    PiiScrub.scrub(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiScrub.scrub($c);")

  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiScrub {
  private val EMAIL = "<EMAIL>".getBytes("US-ASCII")
  private val PHONE = "<PHONE>".getBytes("US-ASCII")

  // byte classes
  private val isA = new Array[Boolean](256) // email local part
  private val isB = new Array[Boolean](256) // email domain
  private val isL = new Array[Boolean](256) // letters
  private val isD = new Array[Boolean](256) // digits
  private val isC = new Array[Boolean](256) // phone middle
  locally {
    def mark(t: Array[Boolean], cs: Seq[Char]): Unit = cs.foreach(c => t(c.toInt) = true)
    val letters = ('A' to 'Z') ++ ('a' to 'z')
    val digits = '0' to '9'
    mark(isL, letters); mark(isD, digits)
    mark(isA, letters ++ digits ++ "._%+-")
    mark(isB, letters ++ digits ++ ".-")
    mark(isC, digits ++ " ()-")
  }
  @inline private def a(b: Array[Byte], i: Int) = isA(b(i) & 0xff)
  @inline private def bb(b: Array[Byte], i: Int) = isB(b(i) & 0xff)
  @inline private def l(b: Array[Byte], i: Int) = isL(b(i) & 0xff)
  @inline private def d(b: Array[Byte], i: Int) = isD(b(i) & 0xff)
  @inline private def c(b: Array[Byte], i: Int) = isC(b(i) & 0xff)

  /** Next email match at or after `from`: packed (start << 32) | end, or -1. */
  private def nextEmail(t: Array[Byte], from: Int): Long = {
    val n = t.length
    var at = from
    while (at < n) {
      // find the next '@' whose local part starts at or after `from`
      if (t(at) == '@') {
        var ls = at
        while (ls > from && a(t, ls - 1)) ls -= 1
        if (ls < at) {
          // maximal B-run after '@'
          var e = at + 1
          while (e < n && bb(t, e)) e += 1
          // rightmost '.' in (at+1, e) followed by >=2 letters; match ends
          // after the maximal letter run following that dot. p > at+1: the
          // domain's B+ must consume at least one char BEFORE the dot
          // ("a@.com" has no match in the JDK engine either)
          var p = e - 1
          var end = -1
          while (p > at + 1 && end < 0) {
            if (t(p) == '.') {
              var q = p + 1
              while (q < n && l(t, q)) q += 1
              if (q - (p + 1) >= 2) end = q
            }
            p -= 1
          }
          if (end > 0) return (ls.toLong << 32) | end.toLong
        }
      }
      at += 1
    }
    -1L
  }

  /** Next phone match at or after `from`: packed (start << 32) | end, or -1. */
  private def nextPhone(t: Array[Byte], from: Int): Long = {
    val n = t.length
    var s = from
    while (s < n) {
      val s0 =
        if (t(s) == '+' && s + 1 < n && d(t, s + 1)) s + 1
        else if (d(t, s)) s
        else -1
      if (s0 >= 0) {
        var e = s0 + 1
        while (e < n && c(t, e)) e += 1
        // rightmost digit at distance >= 6 from the first digit
        var p = e - 1
        while (p >= s0 + 6 && !d(t, p)) p -= 1
        if (p >= s0 + 6) return (s.toLong << 32) | (p + 1).toLong
      }
      s += 1
    }
    -1L
  }

  private def replaceAll(t: Array[Byte],
      next: (Array[Byte], Int) => Long, repl: Array[Byte]): (Array[Byte], Int) = {
    var count = 0
    var from = 0
    var out: java.io.ByteArrayOutputStream = null
    var m = next(t, 0)
    while (m >= 0) {
      if (out == null) out = new java.io.ByteArrayOutputStream(t.length + 16)
      val (s, e) = ((m >> 32).toInt, (m & 0xffffffffL).toInt)
      out.write(t, from, s - from)
      out.write(repl, 0, repl.length)
      count += 1
      from = e
      m = if (e < t.length) next(t, e) else -1L
    }
    if (out == null) (t, 0)
    else { out.write(t, from, t.length - from); (out.toByteArray, count) }
  }

  private def countAll(t: Array[Byte], next: (Array[Byte], Int) => Long): Int = {
    var count = 0
    var m = next(t, 0)
    while (m >= 0) {
      count += 1
      val e = (m & 0xffffffffL).toInt
      m = if (e < t.length) next(t, e) else -1L
    }
    count
  }

  /** Static forwarder for generated code. */
  def scrub(s: UTF8String): GenericArrayData = {
    val orig = s.getBytes
    val (afterEmail, nEmail) = replaceAll(orig, nextEmail, EMAIL)
    val nPhone = countAll(orig, nextPhone)
    val (scrubbed, _) = replaceAll(afterEmail, nextPhone, PHONE)
    new GenericArrayData(Array[Any](
      UTF8String.fromBytes(scrubbed),
      UTF8String.fromString(nEmail.toString),
      UTF8String.fromString(nPhone.toString)))
  }
}
