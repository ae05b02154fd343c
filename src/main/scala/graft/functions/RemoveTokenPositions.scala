package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `remove_token_positions(text, sorted array<int>)` → the whitespace
  * tokens of `text` (maximal non-space runs, the [[TokenHashes]] twin)
  * with the listed 0-based positions dropped, re-joined with single
  * spaces — the span-dedup reassembly step as ONE byte scan, O(n + r)
  * with a merge pointer into the sorted positions array.
  *
  * Replaces the posexplode → (doc, pos)-keyed anti join → collect_list/
  * array_sort/concat_ws reassembly pipeline, which shuffled every token
  * of the corpus twice; here only the (small) removed-position arrays
  * move and the corpus is rewritten in place. Positions outside [0, n)
  * are ignored; an empty/NULL-free result with everything removed is ''.
  * NOTE the output is always the single-space token join, so a doc with
  * no removals is whitespace-NORMALIZED — the same reconstruction the
  * span-dedup oracle's string_agg produces. */
case class RemoveTokenPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "remove_token_positions"

  override def nullSafeEval(text: Any, rem: Any): Any =
    RemoveTokenPositions.rebuild(
      text.asInstanceOf[UTF8String], rem.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, r) =>
      s"${ev.value} = graft.functions.RemoveTokenPositions.rebuild($t, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveTokenPositions =
    copy(left = newLeft, right = newRight)
}

object RemoveTokenPositions {

  /** Static forwarder for generated code. `rem` must be sorted ascending
    * (duplicates tolerated); null elements are ignored. */
  def rebuild(s: UTF8String, rem: ArrayData): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val nRem = rem.numElements()
    // single pass over bytes; token index advances on token starts, and a
    // merge pointer walks the sorted removal list
    val out = new Array[Byte](n)
    var p = 0          // write offset
    var tokIdx = -1    // current token index
    var ri = 0         // next removal candidate
    var dropCur = false
    var wroteAny = false
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') {
        if (!inTok) {
          inTok = true
          tokIdx += 1
          while (ri < nRem && (rem.isNullAt(ri) || rem.getInt(ri) < tokIdx)) ri += 1
          dropCur = ri < nRem && rem.getInt(ri) == tokIdx
          if (!dropCur) {
            if (wroteAny) { out(p) = ' '; p += 1 }
            wroteAny = true
          }
        }
        if (!dropCur) { out(p) = b(i); p += 1 }
      } else inTok = false
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, p))
  }
}
