package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `remove_token_spans(text, sorted array<int> of window STARTS, k)` →
  * the whitespace tokens of `text` with every token covered by any
  * k-token window [start, start + k) dropped, re-joined with single
  * spaces — [[RemoveTokenPositions]] taking span starts instead of
  * pre-exploded covered positions.
  *
  * This moves the 16× coverage expansion out of the shuffle and into the
  * kernel: the span-dedup/decontamination/boilerplate removal collapse
  * now aggregates one int per MATCHED WINDOW (not k ints per window),
  * and under heavy duplication — where most of a doc is covered and the
  * exploded form degenerates (measured: the r7 boilerplate entry spent
  * 56 s of its sf≈1 sweep time in the explode/distinct of ~640M covered
  * positions) — the per-doc array shrinks by k× and the distinct
  * disappears entirely (overlapping spans merge in the linear walk).
  * Starts must be sorted ascending (duplicates fine, nulls ignored);
  * single pass, O(n + r). */
case class RemoveTokenSpans(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "remove_token_spans"

  override def nullSafeEval(text: Any, starts: Any, k: Any): Any =
    RemoveTokenSpans.rebuild(text.asInstanceOf[UTF8String],
      starts.asInstanceOf[ArrayData], k.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, k) =>
      s"${ev.value} = graft.functions.RemoveTokenSpans.rebuild($t, $s, (int) $k);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): RemoveTokenSpans = copy(first = f, second = s, third = t)
}

object RemoveTokenSpans {

  /** Static forwarder for generated code. `starts` sorted ascending. */
  def rebuild(s: UTF8String, starts: ArrayData, k: Int): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val nSt = starts.numElements()
    val out = new Array[Byte](n)
    var p = 0          // write offset
    var tokIdx = -1    // current token index
    var si = 0         // next span candidate
    var coverEnd = -1  // exclusive end of the merged coverage reached so far
    var dropCur = false
    var wroteAny = false
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') {
        if (!inTok) {
          inTok = true
          tokIdx += 1
          // advance over spans starting at or before this token, extending
          // the merged coverage window
          while (si < nSt && (starts.isNullAt(si) || starts.getInt(si) <= tokIdx)) {
            if (!starts.isNullAt(si)) {
              val e = starts.getInt(si) + k
              if (e > coverEnd) coverEnd = e
            }
            si += 1
          }
          dropCur = tokIdx < coverEnd
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
