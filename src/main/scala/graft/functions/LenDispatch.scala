package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's len()/length(), TYPE-dispatched (r14 nested-types scout):
  * duck's len works on BOTH strings (character count) and lists
  * (element count), but the translator's shape-based size() dispatch
  * cannot see the type of a LAMBDA VARIABLE — `list_transform(xs, x ->
  * len(x))` resolved to Spark's string-only length and failed loudly on
  * array elements. This kernel dispatches at RESOLUTION time on the
  * child's actual type: string → numChars, binary → byte count,
  * array/map → element count; other types fail like duck. Emitted only
  * for bare-identifier args the shape scan cannot classify — literal
  * strings and call expressions keep Spark's native length (pinned
  * emissions unchanged). */
case class LenDispatchExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_len"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType | _: MapType | NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_len requires a string, binary, array or map input, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any = child.dataType match {
    case StringType => a.asInstanceOf[UTF8String].numChars()
    case BinaryType => a.asInstanceOf[Array[Byte]].length
    case _: ArrayType =>
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].numElements()
    case _: MapType =>
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData].numElements()
    case _ => null
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"($c).numChars()")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"($c).length")
      case _ =>
        defineCodeGen(ctx, ev, c => s"($c).numElements()")
    }
  override protected def withNewChildInternal(c: Expression): LenDispatchExpr =
    copy(child = c)
}
