package graft.formats

import org.apache.spark.sql.types._

/** Spark DataType → ClickHouse-style type name for response `meta` blocks.
  *
  * The reference emits the engine's native type names in `meta`
  * (`/root/reference/main.py:148,170`); ClickHouse clients only use them
  * loosely, but we keep recognizable ClickHouse spellings.
  */
object ClickHouseTypeNames {
  def of(dt: DataType): String = dt match {
    case StringType => "String"
    case BooleanType => "UInt8"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case DateType => "Date"
    case _: TimestampType => "DateTime64(6)"
    case TimestampNTZType => "DateTime64(6)"
    case BinaryType => "String"
    case ArrayType(et, _) => s"Array(${of(et)})"
    case MapType(kt, vt, _) => s"Map(${of(kt)}, ${of(vt)})"
    case s: StructType =>
      "Tuple(" + s.fields.map(f => s"${f.name} ${of(f.dataType)}").mkString(", ") + ")"
    case NullType => "Nullable(Nothing)"
    case other => other.sql
  }
}
