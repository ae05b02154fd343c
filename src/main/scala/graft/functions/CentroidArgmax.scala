package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Single-kernel IVF centroid assignment (r10, VERDICT r9 #6).
  *
  * The previous assignment built one `cosine_sim(vec, typedLit(centroid))`
  * column per centroid and argmax'd the array — O(k·dim) literal floats in
  * the plan (~1M at the 4,096-centroid clamp, serialized to every task)
  * and a projection far past Spark's ~100-field whole-stage-codegen
  * fallback, so the "codegen kernel" quietly degraded to interpreted eval
  * at exactly the scale the auto-sizing targets. This kernel takes the
  * whole centroid matrix as ONE row-major flat `array<float>` riding a
  * 1-row broadcast relation (the `quant_dot` precedent: plan carries an
  * attribute reference, the data ships once as a broadcast table) and
  * returns the argmax centroid id in a single codegen pass.
  *
  * Byte-identical to the old form (spec-asserted):
  *   - per-centroid cosine accumulates in the same element order with the
  *     same double arithmetic as [[CosineSim]] (null vec elements read 0);
  *   - zero norm → sim -2.0 (the old `coalesce(cosine_sim(…), -2.0)`);
  *   - vec length ≠ centroid dim → every sim -2.0 → centroid 0 (the old
  *     all-NULL-coalesced argmax);
  *   - ties keep the FIRST max (old `array_position(sims, array_max)`),
  *     with Spark's NaN-greatest ordering reproduced explicitly.
  */
object CentroidArgmaxKernel {
  def computeBoxed(vec: ArrayData, cmat: ArrayData, dim: Int): Integer = {
    val total = cmat.numElements()
    if (dim <= 0 || total == 0 || total % dim != 0) return null
    val k = total / dim
    val n = vec.numElements()
    if (n != dim) return Integer.valueOf(0)
    // vec self-norm accumulates once, in the same i-ascending order the
    // per-centroid form used (identical FP result)
    var na = 0.0
    var i = 0
    while (i < n) {
      val xv = if (vec.isNullAt(i)) 0.0f else vec.getFloat(i)
      na += xv.toDouble * xv
      i += 1
    }
    var best = 0.0; var bestNaN = false; var bi = 0
    var c = 0
    while (c < k) {
      var dot = 0.0; var nb = 0.0
      val base = c * dim
      i = 0
      while (i < dim) {
        val xv = if (vec.isNullAt(i)) 0.0f else vec.getFloat(i)
        val cv = cmat.getFloat(base + i)
        dot += xv.toDouble * cv; nb += cv.toDouble * cv
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      val s = if (den == 0.0) -2.0 else dot / den
      val sNaN = java.lang.Double.isNaN(s)
      // Spark array_max ordering: NaN greatest; first occurrence wins
      val gt = if (sNaN) !bestNaN else !bestNaN && s > best
      if (c == 0 || gt) { best = s; bestNaN = sNaN; bi = c }
      c += 1
    }
    Integer.valueOf(bi)
  }
}

/** `centroid_argmax(array<float> vec, array<float> cmatFlat)` → INT id of
  * the nearest (cosine) centroid; `dim` fixed at build time. */
case class CentroidArgmax(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "centroid_argmax"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = CentroidArgmaxKernel.computeBoxed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)
    if (r == null) null else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Integer r =
         |  graft.functions.CentroidArgmaxKernel.computeBoxed($a, $b, $dim);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidArgmax =
    copy(left = newLeft, right = newRight)
}
