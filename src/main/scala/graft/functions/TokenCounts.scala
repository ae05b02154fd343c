package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE byte scan →
  * `array<struct<term:string, cnt:int>>`, one entry per DISTINCT token
  * (first-occurrence order). Tokens are maximal non-space runs, the
  * [[TokenHashes]]/[[ChunkWindows]] twin — identical to
  * `filter(split(s, ' '), t -> t != '')`.
  *
  * This is the single-scan spine of corpus tf-idf (p54): exploding the
  * entries and partial-aggregating by (source, term) makes the ONLY
  * corpus-sized work one scan + one kernel pass, with the downstream
  * vocab-sized exchange shared by the tf and df branches (both derive
  * from the same frame, so each (doc, term) pair appears exactly once —
  * `count(*)` per term IS the document frequency, no `distinct` needed).
  * The naive alternative — `explode(array_distinct(tokens))` for df plus
  * `explode(tokens)` for tf — scans and tokenizes the corpus twice. */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "token_counts"

  override def nullSafeEval(input: Any): Any =
    TokenCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.counts($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {

  /** Static forwarder for generated code. Map insertion order preserved so
    * the output is deterministic (first occurrence). */
  def counts(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val m = new java.util.LinkedHashMap[UTF8String, Array[Int]]()
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val isSep = i == n || b(i) == ' '
      if (!isSep) { if (tokStart < 0) tokStart = i }
      else if (tokStart >= 0) {
        val tok = UTF8String.fromBytes(b, tokStart, i - tokStart)
        val c = m.get(tok)
        if (c == null) m.put(tok, Array(1)) else c(0) += 1
        tokStart = -1
      }
      i += 1
    }
    val out = new Array[AnyRef](m.size)
    var k = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
