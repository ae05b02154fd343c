package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass whitespace tokenizer + membership counter for the text-quality
  * and language-ID pipelines (SURVEY §2.11).
  *
  * `token_set_hits(text, set1, set2, …)` returns `array<int>` of length
  * `nSets + 1`: element 0 is the token count (split on single 0x20 space,
  * empties dropped — exactly `len(list_filter(string_split(text,' '),
  * x -> x <> ''))`), element i is how many tokens are members of set i.
  * A word may appear in several sets ('la' is both FR and ES); membership
  * is precomputed as a bitmask per word so the scan does ONE hash lookup
  * per token regardless of the number of sets.
  *
  * Replaces per-language `size(filter(tokens, array_contains…))` chains:
  * higher-order-function lambdas are interpreted per element, which made
  * language-ID the most expensive text entry (4.4 s at sf1); this is one
  * codegen'd linear scan per document.
  */
case class TokenSetHits(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_set_hits"

  // word -> bitmask of the sets containing it, on UTF8String for zero-copy
  // lookups against tokens sliced straight out of the input bytes
  @transient private lazy val maskMap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    wordSets.zipWithIndex.foreach { case (set, i) =>
      set.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    TokenSetHits.hits(input.asInstanceOf[UTF8String], maskMap, wordSets.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("wordMask", maskMap, "java.util.HashMap")
    nSafeCodeGen(ctx, ev, mapRef)
  }

  private def nSafeCodeGen(ctx: CodegenContext, ev: ExprCode, mapRef: String): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenSetHits.hits($c, $mapRef, ${wordSets.length});")

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

object TokenSetHits {
  /** Static forwarder; tokens are sliced from the input's byte array with
    * no per-token copy (UTF8String.fromBytes wraps the backing array). */
  def hits(s: UTF8String, map: java.util.HashMap[UTF8String, Integer],
      nSets: Int): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Int](nSets + 1)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) {
          counts(0) += 1
          if (nSets > 0) {
            val m = map.get(UTF8String.fromBytes(bytes, start, i - start))
            if (m != null) {
              var mask = m.intValue()
              while (mask != 0) {
                val bit = Integer.numberOfTrailingZeros(mask)
                counts(bit + 1) += 1
                mask &= mask - 1
              }
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** `ascii_char_count(text, chars)`: how many of the string's characters are
  * in the given ASCII set — one byte-table scan, equal to
  * `length(s) - length(regexp_replace(s, '[<chars>]', ''))` when every
  * class member is single-byte ASCII (multi-byte chars can't match). */
case class AsciiCharCount(child: Expression, chars: String)
    extends UnaryExpression {
  require(chars.forall(_ < 0x80), "AsciiCharCount class must be pure ASCII")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ascii_char_count"

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c.toInt) = true)
    t
  }

  override def nullSafeEval(input: Any): Any =
    AsciiCharCount.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("charTable", table, "boolean[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiCharCount.count($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiCharCount =
    copy(child = newChild)
}

object AsciiCharCount {
  def count(s: UTF8String, table: Array[Boolean]): Int = {
    val bytes = s.getBytes
    var n = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && table(b)) n += 1
      i += 1
    }
    n
  }
}
