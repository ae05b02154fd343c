package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Portable 60-bit SimHash over the sliding byte `n`-gram shingles of a
  * BINARY payload → `bigint` — the perceptual-hash-style kernel for
  * multimodal near-dup (the image-dedup analog of [[SimHashMd5]]'s token
  * simhash): one vote per shingle occurrence at positions `0..len−n`, the
  * per-shingle hash being md5 digest bytes 8..15 masked to 60 bits
  * (`CAST('0x' || substr(md5(g), 18, 15) AS BIGINT)` in external SQL), so
  * every signature — hence the banded hamming pair set — is reproducible
  * by an oracle engine. Payloads shorter than `n` have no shingles and
  * hash to 0.
  *
  * A real image pipeline would phash decoded pixels; over the opaque
  * binary column this byte-shingle sketch is the codec-free analog — small
  * byte edits (metadata patches, re-muxed containers) perturb few
  * shingles, so hamming distance stays small, while unrelated payloads are
  * near-random. One linear scan, no shuffle; pairs come from the same
  * pigeonhole-exact banding as the token simhash. */
case class ByteShingleSimhash(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, "byte_shingle_simhash: n must be positive")

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_shingle_simhash"

  override def nullSafeEval(input: Any): Any =
    ByteShingleSimhash.compute(input.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteShingleSimhash.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ByteShingleSimhash =
    copy(child = newChild)
}

object ByteShingleSimhash {

  /** Static forwarder for generated code. */
  def compute(b: Array[Byte], n: Int): Long = {
    val len = b.length
    if (len < n) return 0L
    val votes = new Array[Int](SimHashMd5.Bits)
    val g = new Array[Byte](n)
    var i = 0
    while (i <= len - n) {
      System.arraycopy(b, i, g, 0, n)
      val h = SimHashMd5.tokenHash(g)
      var bit = 0
      while (bit < SimHashMd5.Bits) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < SimHashMd5.Bits) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}
