package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-level Shannon entropy (bits) in ONE byte scan —
  * the classic repeated-character/low-diversity spam signal of a curation
  * gate (SURVEY §2.11 north star; the explode-free sibling of the p10–p13
  * kernel family).
  *
  * Counts UTF-8 BYTES (== characters for the ASCII corpora this gates;
  * multi-byte text scores its byte distribution — documented divergence vs
  * a codepoint split, which would need a decode pass). The 256-bucket count
  * table then folds to -Σ p·log2(p) in ascending byte order — a fixed
  * summation order, so the result is bit-deterministic across partitionings
  * (the oracle's GROUP BY sums in engine order; micro-quantization absorbs
  * the ≤1e-15 relative difference, the q163 precedent).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"
  override def nullSafeEval(s: Any): Any =
    CharEntropy.entropy(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharEntropy.entropy($s);")
  override protected def withNewChildInternal(c: Expression): CharEntropy =
    copy(child = c)
}

object CharEntropy {
  private val Log2 = math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0.0
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) { counts(bytes(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    var b = 0
    while (b < 256) {
      val c = counts(b)
      if (c > 0) {
        val p = c.toDouble / n
        h -= p * (math.log(p) / Log2)
      }
      b += 1
    }
    h
  }
}
