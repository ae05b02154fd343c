package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-2-gram repetition stats: returns
  * `array(n_grams, n_distinct_grams)` over the whitespace tokens of the
  * input (tokens = maximal runs of non-space bytes, exactly
  * `list_filter(string_split(s, ' '), x -> x <> '')`).
  *
  * Replaces the transform-concat-array_distinct column pipeline (which
  * allocates one string per gram and a hash set of strings per row) with
  * a single byte scan: tokens are FNV-1a-hashed incrementally, adjacent
  * pairs mixed into 64-bit gram hashes, distinct counted in a per-row
  * open-addressing table keyed by (hash, token-pair bytes) — on a
  * slot-hash match the actual token bytes are compared (r5), so the
  * count is EXACTLY `array_distinct` semantics even under a 64-bit
  * collision, with the byte compare only ever running on hash-equal
  * slots (i.e. almost never). */
case class DupGramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_gram_stats"

  override def nullSafeEval(input: Any): Any =
    DupGramStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DupGramStats.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): DupGramStats =
    copy(child = newChild)
}

object DupGramStats {
  import FnvHash.{Offset => FnvOffset, Prime => FnvPrime}

  // 64-bit avalanche over the ordered pair (splitmix64 finalizer)
  @inline private def mix(h1: Long, h2: Long): Long =
    FnvHash.avalanche(h1 * 0x9e3779b97f4a7c15L + h2)

  /** Static forwarder for generated code. */
  def stats(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    // pass 1: token count (maximal non-space runs)
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') { if (!inTok) nTok += 1; inTok = true }
      else inTok = false
      i += 1
    }
    val nGrams = math.max(0, nTok - 1)
    if (nGrams == 0) return new GenericArrayData(Array[Any](0L, 0L))
    // pass 2: hash tokens, mix adjacent pairs, count distinct. EXACT (r5):
    // a slot stores the gram hash AND the two token byte ranges; on a
    // slot-hash match the actual token bytes are compared, so a 64-bit
    // collision probes on instead of silently merging two grams —
    // distinct-count now equals the array_distinct semantics exactly
    // (tokens cannot contain the separator, so per-token byte equality ⇔
    // gram string equality even across runs of multiple spaces).
    var cap = 8
    while (cap < nGrams * 2) cap <<= 1
    val table = new Array[Long](cap) // 0 = empty slot
    val aOff = new Array[Int](cap); val aLen = new Array[Int](cap)
    val bOff = new Array[Int](cap); val bLen = new Array[Int](cap)
    val mask = cap - 1
    @inline def rangesEq(o1: Int, l1: Int, o2: Int, l2: Int): Boolean = {
      if (l1 != l2) return false
      var k = 0
      while (k < l1) { if (b(o1 + k) != b(o2 + k)) return false; k += 1 }
      true
    }
    var distinct = 0L
    var prevH = 0L
    var prevOff = 0; var prevLen = 0
    var havePrev = false
    var h = FnvOffset
    var tokOff = 0
    var inT = false
    i = 0
    while (i <= n) {
      val isSep = i == n || b(i) == ' '
      if (!isSep) {
        if (!inT) tokOff = i
        h = (h ^ (b(i) & 0xff)) * FnvPrime
        inT = true
      } else if (inT) {
        // token ended: bytes [tokOff, i), hash h
        val tokLen = i - tokOff
        if (havePrev) {
          var g = mix(prevH, h)
          if (g == 0) g = 1L // reserve 0 for empty slots
          var slot = (g & mask).toInt
          while (table(slot) != 0 && !(table(slot) == g &&
            rangesEq(aOff(slot), aLen(slot), prevOff, prevLen) &&
            rangesEq(bOff(slot), bLen(slot), tokOff, tokLen)))
            slot = (slot + 1) & mask
          if (table(slot) == 0) {
            table(slot) = g
            aOff(slot) = prevOff; aLen(slot) = prevLen
            bOff(slot) = tokOff; bLen(slot) = tokLen
            distinct += 1
          }
        }
        prevH = h
        prevOff = tokOff; prevLen = tokLen
        havePrev = true
        h = FnvOffset
        inT = false
      }
      i += 1
    }
    new GenericArrayData(Array[Any](nGrams.toLong, distinct))
  }
}
