package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash over a token array (`array<string>`) → `bigint`.
  *
  * Classic Charikar sketch: each token is xxhash64'd; each of the 64 result
  * bits votes +1/-1; the sign of each vote total becomes the output bit.
  * Near-duplicate documents then differ in few bits — pair candidates are
  * found with `bit_count(a ^ b) <= k` band joins (see
  * [[graft.operators.Dedup.simhashPairs]]), never a cross join.
  *
  * Codegen: emits a static call into [[SimHash64.compute]] — the token loop
  * runs as compiled Scala while the expression stays inside the
  * whole-stage-codegen span (no per-row InternalRow boxing, unlike
  * CodegenFallback).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  // input must be array<string> (AbstractDataType is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
