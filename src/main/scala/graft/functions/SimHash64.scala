package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * Interpreted (CodegenFallback): the per-token 64-bit loop dominates; the
  * hash itself is the cost either way.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // input must be array<string> (AbstractDataType is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
