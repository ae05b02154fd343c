package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Random-hyperplane LSH signature of a float/double vector → up-to-64-bit
  * mask (bit j = sign(v · r_j)), the bucketing primitive behind ANN search
  * and embedding near-dup (reference capability: LLM-pipeline similarity,
  * SURVEY §2.11 north star).
  *
  * One pass over the vector, all planes per element — the previous
  * column-level encoding (`aggregate(sequence(...))` per plane) re-walked
  * the array `planes` times through interpreted lambda dispatch; this is
  * the [[MinHashSig]] codegen pattern applied to hyperplanes.
  *
  * Hyperplane components are SplitMix64-derived from (plane, dim):
  * deterministic across runs, executors and clusters with no materialized
  * model to ship.
  */
case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression {

  require(planes > 0 && planes <= 64, "planes must be in [1, 64]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  // element accessor dispatched on the RESOLVED element type — reading an
  // int array through getFloat would reinterpret bits and emit garbage
  // signatures with no error
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double|int|bigint>, got ${other.sql}")
  }

  private lazy val readElem: (ArrayData, Int) => Double = child.dataType match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
    case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
    case _ => (a, i) => a.getFloat(i).toDouble // unreachable post-analysis
  }

  def compute(arr: ArrayData): Long = {
    val dims = arr.numElements()
    val dots = new Array[Double](planes)
    var d = 0
    while (d < dims) {
      if (!arr.isNullAt(d)) {
        val v = readElem(arr, d)
        var j = 0
        while (j < planes) {
          dots(j) += v * HyperplaneSig.component(j, d)
          j += 1
        }
      }
      d += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes) {
      if (dots(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this, classOf[HyperplaneSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {

  /** Deterministic pseudo-random hyperplane component r_plane[dim] in
    * [-1, 1). */
  def component(plane: Int, dim: Int): Double = {
    val h = MinHashSig.splitmix(plane.toLong * 0x9e3779b97f4a7c15L + dim.toLong + 1L)
    (Math.floorMod(h, 2000003L) - 1000001L).toDouble / 1000001.0
  }

  /** Driver-side signature of a single query vector — lets an ANN query
    * derive its probe buckets without launching any Spark job over the
    * corpus. Must stay in lockstep with [[HyperplaneSig.compute]]. */
  def signatureOf(vec: Array[Float], planes: Int): Long = {
    require(planes > 0 && planes <= 64)
    val dots = new Array[Double](planes)
    var d = 0
    while (d < vec.length) {
      var j = 0
      while (j < planes) {
        dots(j) += vec(d).toDouble * component(j, d)
        j += 1
      }
      d += 1
    }
    var sig = 0L
    var j = 0
    while (j < planes) {
      if (dots(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
