package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding context-window chunking in ONE byte scan → `array<string>`:
  * the whitespace tokens of `child` (maximal non-space runs, the
  * [[TokenHashes]]/[[graft.operators.TextAnalysis.tokens]] twin) cut into
  * windows of `window` tokens advancing by `stride`, each chunk rebuilt as
  * a single-space-joined string. Chunk count is 1 for docs within one
  * window (a tokenless doc yields one empty chunk, matching
  * `concat_ws(' ', slice([], …)) = ''`), else
  * `ceil((n − window)/stride) + 1`, so every token is covered and the last
  * window may run short.
  *
  * Replaces the `transform(sequence(…), i -> slice(tk, …))` +
  * `concat_ws` pipeline: higher-order functions run interpreted per
  * element and materialize the token array plus every slice; here the
  * chunks are copied straight out of the input bytes (total output
  * ~window/stride ≈ 1.33× the input — linear in doc length, the r6
  * verdict's scale fix, AND constant-factor cheap). */
case class ChunkWindows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {
  require(window > 0 && stride > 0, "chunk_windows: window and stride must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_windows"

  override def nullSafeEval(input: Any): Any =
    ChunkWindows.chunks(input.asInstanceOf[UTF8String], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ChunkWindows.chunks($c, $window, $stride);")

  override protected def withNewChildInternal(newChild: Expression): ChunkWindows =
    copy(child = newChild)
}

object ChunkWindows {

  /** Static forwarder for generated code. */
  def chunks(s: UTF8String, window: Int, stride: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    // pass 1: count tokens to size the offset tables
    var nTok = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (b(i) != ' ') { if (!inTok) nTok += 1; inTok = true }
      else inTok = false
      i += 1
    }
    // pass 2: token [start, end) byte offsets
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var k = 0
    i = 0
    inTok = false
    while (i <= n) {
      val isSep = i == n || b(i) == ' '
      if (!isSep) { if (!inTok) { starts(k) = i; k += 1 }; inTok = true }
      else { if (inTok) ends(k - 1) = i; inTok = false }
      i += 1
    }
    val nc =
      if (nTok <= window) 1 else (nTok - window + stride - 1) / stride + 1
    val out = new Array[AnyRef](nc)
    var ci = 0
    while (ci < nc) {
      val t0 = ci * stride
      val t1 = math.min(t0 + window, nTok)
      if (t0 >= t1) out(ci) = UTF8String.EMPTY_UTF8 // only the tokenless doc
      else {
        var len = t1 - t0 - 1 // single-space separators
        var t = t0
        while (t < t1) { len += ends(t) - starts(t); t += 1 }
        val buf = new Array[Byte](len)
        var p = 0
        t = t0
        while (t < t1) {
          if (t > t0) { buf(p) = ' '; p += 1 }
          val tl = ends(t) - starts(t)
          System.arraycopy(b, starts(t), buf, p, tl)
          p += tl
          t += 1
        }
        out(ci) = UTF8String.fromBytes(buf)
      }
      ci += 1
    }
    new GenericArrayData(out)
  }
}
