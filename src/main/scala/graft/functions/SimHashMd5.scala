package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Portable 60-bit SimHash over a token array (`array<string>`) → `bigint`.
  *
  * Same Charikar sketch as [[SimHash64]], but the per-token hash is derived
  * from MD5 instead of xxhash64: the token's hash is the 60-bit integer
  * spelled by hex characters 18..32 of `md5(token)` — i.e. the low 8 bytes
  * of the digest, big-endian, masked to 60 bits. That exact value is
  * re-computable in ANSI-ish SQL (`CAST('0x' || substr(md5(t), 18, 15) AS
  * BIGINT)`), which is what makes the simhash dedup pipeline
  * oracle-checkable end to end: an external engine can reproduce every
  * signature, hence the exact hamming-threshold pair set. 60 bits (not 64)
  * so the value always fits a SIGNED 64-bit integer in any engine.
  *
  * [[SimHash64]] (xxhash64) remains the fast default for production use;
  * this variant exists for cross-engine verification and costs one MD5 per
  * token (still a linear scan, no shuffle).
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashMd5.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

object SimHashMd5 {
  val Bits = 60
  private val Mask = (1L << Bits) - 1

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit portable token hash: md5 digest bytes 8..15 big-endian, top
    * nibble dropped — identical to parsing hex chars 18..32 of the digest. */
  def tokenHash(tokenUtf8: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(tokenUtf8)
    var v = 0L
    var i = 8
    while (i < 16) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v & Mask
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
