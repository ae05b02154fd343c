package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All 64-bit token hashes of a string in ONE byte scan →
  * `array<bigint>`, one element per whitespace token (maximal runs of
  * non-space bytes, exactly `list_filter(string_split(s,' '), x -> x <> '')`
  * — the [[graft.operators.TextAnalysis.tokens]] twin), in order, NOT
  * deduplicated (unlike `token_window_hashes`, whose distinct set feeds
  * minhash).
  *
  * Replaces `explode(split(...))` + `xxhash64(tok)` pipelines that
  * allocate a UTF8String per token before hashing: tokens are FNV-1a'd
  * incrementally during the scan and avalanched (splitmix64 finalizer),
  * so no per-token string ever materializes. The hash only needs to be
  * internally consistent (hash-join/group keys); collisions merge two
  * tokens' counts at ~distinct²/2⁶⁴ odds — the same documented concession
  * as [[DupGramStats]], deterministic, and oracle-visible on a fixture. */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenHashes.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenHashes.hashes($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  import FnvHash.{Offset => FnvOffset, Prime => FnvPrime}

  /** Static forwarder for generated code. */
  def hashes(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    // pass 1: token count (maximal non-space runs) to size the array
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') { if (!inTok) nTok += 1; inTok = true }
      else inTok = false
      i += 1
    }
    val out = new Array[Long](nTok)
    // pass 2: incremental FNV-1a per token + finalizer
    var k = 0
    var h = FnvOffset
    var inT = false
    i = 0
    while (i <= n) {
      val isSep = i == n || b(i) == ' '
      if (!isSep) {
        h = (h ^ (b(i) & 0xff)) * FnvPrime
        inT = true
      } else if (inT) {
        out(k) = FnvHash.avalanche(h)
        k += 1
        h = FnvOffset
        inT = false
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
