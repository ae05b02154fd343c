package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Quantized-vector similarity kernels for the integer-exact similarity
  * entries (SURVEY §2.11): each float element is quantized to
  * `CAST(round(CAST(x AS DOUBLE)*1000) AS BIGINT)` and all arithmetic runs
  * on longs, so results are bit-identical cross-engine. The query-side
  * vector arrives pre-quantized (`array<bigint>`, computed once on the
  * 1-row broadcast side with Spark's own `round`); the data-side vector is
  * quantized here inside one codegen loop.
  *
  * Replaces the previous three `zip_with`+`aggregate` lambda passes per row
  * — higher-order functions are interpreted per element, which made the
  * 20k-row sf1 scan cost 3.2 s; this runs inside whole-stage codegen.
  *
  * Quantization matches Spark's `round(double)` exactly (BigDecimal HALF_UP
  * on `Double.toString`, probed: 2.5→3, -2.5→-3, 0.49999999999999994→0).
  * Null semantics mirror the SQL forms: length mismatch → NULL (zip_with
  * pads with nulls, which poison the sum), any null element → NULL.
  */
object QuantVec {
  @inline private def quant(x: Float): Long =
    java.math.BigDecimal.valueOf(x.toDouble * 1000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Σ q(a_i)·b_i over (array<float>, array<bigint>); null on mismatch. */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += quant(a.getFloat(i)) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  /** round(1e6·dot/(sqrt(qq)·sqrt(ee))) with the same FP evaluation order
    * as the SQL form `1000000.0 * CAST(dot AS DOUBLE) / (sqrt(qq)*sqrt(ee))`. */
  def cosMicroBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0L; var ee = 0L; var qq = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val xq = quant(a.getFloat(i)); val yq = b.getLong(i)
      dot += xq * yq; ee += xq * xq; qq += yq * yq
      i += 1
    }
    val den = math.sqrt(qq.toDouble) * math.sqrt(ee.toDouble)
    if (den == 0.0) return null
    java.lang.Long.valueOf(
      java.math.BigDecimal.valueOf(1000000.0 * dot.toDouble / den)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
  }
}

/** `quant_dot(array<float>, array<bigint>)` → BIGINT. */
case class QuantDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long r = graft.functions.QuantVec.dotBoxed($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantDot =
    copy(left = newLeft, right = newRight)
}

/** `quant_cos_micro(array<float>, array<bigint>)` → BIGINT cosine in
  * micro-units over the quantized elements. */
case class QuantCosMicro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "quant_cos_micro"

  override def nullSafeEval(a: Any, b: Any): Any =
    QuantVec.cosMicroBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long r = graft.functions.QuantVec.cosMicroBoxed($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): QuantCosMicro =
    copy(left = newLeft, right = newRight)
}
