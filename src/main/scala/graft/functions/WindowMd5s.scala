package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw 16-byte md5 of EVERY k-token sliding window (stride 1) →
  * `array<binary>`, element `i` = the digest of
  * `concat_ws(' ', tokens[i..i+k))`, for positions
  * `0..n−k` (empty array when the doc has fewer than `k` whitespace
  * tokens). Tokens are maximal non-space runs, the
  * [[TokenHashes]]/[[ChunkWindows]] twin.
  *
  * The span-dedup keying kernel: downstream duplicate detection groups on
  * the 16-byte digest, so window CONTENT (k ≈ 16–50 tokens per position —
  * k× the corpus) never materializes or shuffles; only digests and
  * positions move. md5 (128-bit) rather than a 64-bit hash because the
  * dedup must match an exact-content oracle — the established portable-
  * digest concession (p01/p04): a collision needs ~2⁶⁴ windows. Raw
  * bytes, not hex: the digests are pure shuffle keys, and 16-byte binary
  * halves the keep-first window's shuffle/sort bytes.
  *
  * Work is inherently k× the byte scan (overlapping windows re-hash every
  * token k times; md5 has no rolling form) — the same cost the brute-force
  * oracle pays per gram. */
case class WindowMd5s(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "window_md5s: k must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "window_md5s"

  override def nullSafeEval(input: Any): Any =
    WindowMd5s.digests(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WindowMd5s.digests($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WindowMd5s =
    copy(child = newChild)
}

object WindowMd5s {
  private val SpaceByte = Array[Byte](' ')

  /** Static forwarder for generated code. */
  def digests(s: UTF8String, k: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') { if (!inTok) nTok += 1; inTok = true }
      else inTok = false
      i += 1
    }
    if (nTok < k) return new GenericArrayData(new Array[AnyRef](0))
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var kk = 0
    i = 0
    inTok = false
    while (i <= n) {
      val isSep = i == n || b(i) == ' '
      if (!isSep) { if (!inTok) { starts(kk) = i; kk += 1 }; inTok = true }
      else { if (inTok) ends(kk - 1) = i; inTok = false }
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[AnyRef](nTok - k + 1)
    var p = 0
    while (p <= nTok - k) {
      md.reset()
      var t = p
      while (t < p + k) {
        if (t > p) md.update(SpaceByte)
        md.update(b, starts(t), ends(t) - starts(t))
        t += 1
      }
      out(p) = md.digest()
      p += 1
    }
    new GenericArrayData(out)
  }
}
