package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Coalesce, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.{DeclarativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB aggregates Spark lacks (r7): `product`, `entropy`, `histogram`
  * (`/root/reference/main.py:231` — the engine's aggregate surface reaches
  * clients through the HTTP wire unmodified).
  *
  * Probe-pinned on DuckDB 1.0:
  *  - product: DOUBLE; NULLs skipped; empty / all-NULL group → NULL
  *    (`product(2,0,-3)` is `-0.0` — plain double multiply, replicated here
  *    by a declarative buffer, so partial aggregation is map-side combined).
  *  - entropy: Shannon entropy in bits (log2) over VALUE FREQUENCIES;
  *    NULLs skipped; empty / all-NULL group → 0.0 (not NULL).
  *  - histogram: MAP(value → count), keys sorted ascending, NULLs skipped,
  *    empty group → NULL.
  *
  * entropy/histogram share a value→count open-map buffer
  * ([[CountMapAggregate]], a [[TypedImperativeAggregate]] — same execution
  * shape as Spark's own collect_list/percentile: partial maps merge
  * map-side, so a 100 TB scan moves one (distinct-values)-sized map per
  * partition, not rows). Keys are restricted to atomic orderable types at
  * bind time; the serialized form tags each key with its catalyst class.
  */
case class GraftProduct(child: Expression) extends DeclarativeAggregate
    with UnaryLike[Expression] {
  override def prettyName: String = "product"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val prod = AttributeReference("prod", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = prod :: Nil
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod,
      Multiply(Coalesce(Seq(prod, Literal(1.0))), child)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.right), prod.left,
      Multiply(Coalesce(Seq(prod.left, Literal(1.0))), prod.right)))
  override lazy val evaluateExpression: Expression = prod
  override protected def withNewChildInternal(c: Expression): GraftProduct =
    copy(child = c)
}

abstract class CountMapAggregate
    extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
    with UnaryLike[Expression] {

  /** The documented bind-time restriction (keys must round-trip the tagged
    * serializer): primitives, strings, date/timestamp internals. Decimals,
    * binaries, and nested types are rejected at ANALYSIS, not mid-query
    * from serialize(). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | StringType | DateType | TimestampType |
          TimestampNTZType => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"$prettyName does not support ${other.simpleString} input " +
          "(supported: boolean, integral, floating, string, date, timestamp)")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String from an unsafe row may alias a reused buffer — copy
      val key = v match {
        case s: UTF8String => s.clone()
        case other => other
      }
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    buf
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      k match {
        case v: java.lang.Boolean => out.writeByte(0); out.writeBoolean(v)
        case v: java.lang.Byte => out.writeByte(1); out.writeByte(v.intValue())
        case v: java.lang.Short => out.writeByte(2); out.writeShort(v.intValue())
        case v: java.lang.Integer => out.writeByte(3); out.writeInt(v)
        case v: java.lang.Long => out.writeByte(4); out.writeLong(v)
        case v: java.lang.Float => out.writeByte(5); out.writeFloat(v)
        case v: java.lang.Double => out.writeByte(6); out.writeDouble(v)
        case v: UTF8String =>
          val b = v.getBytes
          out.writeByte(7); out.writeInt(b.length); out.write(b)
        case v =>
          throw new IllegalStateException(
            s"${prettyName}: unsupported key ${v.getClass}")
      }
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    while (i < n) {
      val k: Any = in.readByte() match {
        case 0 => java.lang.Boolean.valueOf(in.readBoolean())
        case 1 => java.lang.Byte.valueOf(in.readByte())
        case 2 => java.lang.Short.valueOf(in.readShort())
        case 3 => java.lang.Integer.valueOf(in.readInt())
        case 4 => java.lang.Long.valueOf(in.readLong())
        case 5 => java.lang.Float.valueOf(in.readFloat())
        case 6 => java.lang.Double.valueOf(in.readDouble())
        case 7 =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
      }
      buf.update(k, in.readLong())
      i += 1
    }
    buf
  }

  /** Keys in ascending catalyst order (all supported key types implement
    * Comparable: boxed primitives and UTF8String). */
  protected def sortedKeys(buf: mutable.HashMap[Any, Long]): Array[Any] =
    buf.keysIterator.toArray.sortWith { (a, b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
}

case class GraftEntropy(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountMapAggregate {
  override def prettyName: String = "entropy"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return 0.0
    val n = buf.valuesIterator.sum.toDouble
    var h = 0.0
    buf.valuesIterator.foreach { c =>
      val p = c / n
      h -= p * (math.log(p) / math.log(2.0))
    }
    h
  }

  override def withNewMutableAggBufferOffset(off: Int): GraftEntropy =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GraftEntropy =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): GraftEntropy =
    copy(child = c)
}

/** DuckDB `mad(x)` — median absolute deviation with interpolated medians
  * (probe: mad{1,2,3,100} = 1.0 via median 2.5; single value → 0.0; empty
  * → NULL; NULLs skipped). Same value→count buffer as histogram/entropy
  * (keys cast to DOUBLE by the registration builder), so memory is
  * bounded by DISTINCT values — the Spark Percentile shape, never a raw
  * value list. */
case class GraftMad(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountMapAggregate {
  override def prettyName: String = "mad"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Interpolated median of a weighted multiset given as sorted
    * (value, count) pairs. */
  private def weightedMedian(pairs: Array[(Double, Long)], n: Long): Double = {
    val p = (n - 1) * 0.5
    val lo = p.toLong // floor: p >= 0
    val frac = p - lo
    var cum = 0L
    var i = 0
    var vLo = 0.0; var vHi = 0.0
    var needHi = frac > 0
    var foundLo = false; var foundHi = !needHi
    while (i < pairs.length && (!foundLo || !foundHi)) {
      cum += pairs(i)._2
      if (!foundLo && cum >= lo + 1) { vLo = pairs(i)._1; foundLo = true }
      if (needHi && !foundHi && cum >= lo + 2) { vHi = pairs(i)._1; foundHi = true }
      i += 1
    }
    if (!needHi) vLo else vLo + frac * (vHi - vLo)
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val pairs = buf.toArray.map { case (k, c) =>
      (k.asInstanceOf[Double], c)
    }.sortBy(_._1)
    val n = pairs.map(_._2).sum
    val med = weightedMedian(pairs, n)
    val devs = pairs.map { case (v, c) => (math.abs(v - med), c) }.sortBy(_._1)
    weightedMedian(devs, n)
  }

  override def withNewMutableAggBufferOffset(off: Int): GraftMad =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GraftMad =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): GraftMad =
    copy(child = c)
}

case class GraftHistogram(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CountMapAggregate {
  override def prettyName: String = "histogram"
  override def dataType: DataType =
    MapType(child.dataType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    if (buf.isEmpty) return null
    val keys = sortedKeys(buf)
    val counts = keys.map(buf(_)).map(c => c: Any)
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(counts))
  }

  override def withNewMutableAggBufferOffset(off: Int): GraftHistogram =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): GraftHistogram =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): GraftHistogram =
    copy(child = c)
}
