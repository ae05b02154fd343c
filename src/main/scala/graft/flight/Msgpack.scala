package graft.flight

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** Minimal MessagePack codec — just the shapes the Airport envelopes use
  * (reference wraps catalog actions in msgpack + zstd,
  * `/root/reference/main.py:402-428`): nil, bool, int, double, str, bin,
  * array, map. No external dependency (zero-egress environment).
  */
object Msgpack {

  sealed trait Value
  case object Nil extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Num(v: Long) extends Value
  final case class Dbl(v: Double) extends Value
  final case class Str(v: String) extends Value
  final case class Bin(v: Array[Byte]) extends Value
  final case class Arr(v: Seq[Value]) extends Value
  final case class MapV(v: Seq[(Value, Value)]) extends Value

  def obj(kvs: (String, Value)*): MapV = MapV(kvs.map { case (k, v) => (Str(k): Value, v) })

  def pack(v: Value): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    write(out, v)
    out.toByteArray
  }

  private def write(out: ByteArrayOutputStream, v: Value): Unit = v match {
    case Nil => out.write(0xc0)
    case Bool(b) => out.write(if (b) 0xc3 else 0xc2)
    case Num(n) =>
      if (n >= 0 && n < 128) out.write(n.toInt)
      else if (n < 0 && n >= -32) out.write(0xe0 | (n.toInt & 0x1f))
      else { out.write(0xd3); writeLong(out, n) } // int64
    case Dbl(d) => out.write(0xcb); writeLong(out, java.lang.Double.doubleToLongBits(d))
    case Str(s) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      if (b.length < 32) out.write(0xa0 | b.length)
      else if (b.length < 256) { out.write(0xd9); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xda); writeShort(out, b.length) }
      else { out.write(0xdb); writeInt(out, b.length) } // str32
      out.write(b, 0, b.length)
    case Bin(b) =>
      if (b.length < 256) { out.write(0xc4); out.write(b.length) }
      else if (b.length < 65536) { out.write(0xc5); writeShort(out, b.length) }
      else { out.write(0xc6); writeInt(out, b.length) } // bin32
      out.write(b, 0, b.length)
    case Arr(items) =>
      if (items.length < 16) out.write(0x90 | items.length)
      else if (items.length < 65536) { out.write(0xdc); writeShort(out, items.length) }
      else { out.write(0xdd); writeInt(out, items.length) } // array32
      items.foreach(write(out, _))
    case MapV(kvs) =>
      if (kvs.length < 16) out.write(0x80 | kvs.length)
      else if (kvs.length < 65536) { out.write(0xde); writeShort(out, kvs.length) }
      else { out.write(0xdf); writeInt(out, kvs.length) } // map32
      kvs.foreach { case (k, x) => write(out, k); write(out, x) }
  }

  private def writeShort(out: ByteArrayOutputStream, n: Int): Unit = {
    out.write((n >> 8) & 0xff); out.write(n & 0xff)
  }
  private def writeInt(out: ByteArrayOutputStream, n: Int): Unit =
    (3 to 0 by -1).foreach(i => out.write((n >> (8 * i)) & 0xff))

  private def writeLong(out: ByteArrayOutputStream, n: Long): Unit =
    (7 to 0 by -1).foreach(i => out.write(((n >> (8 * i)) & 0xff).toInt))

  // ---- reader (for tests / do_action bodies) ----------------------------

  def unpack(bytes: Array[Byte]): Value = {
    val (v, _) = read(bytes, 0)
    v
  }

  private def read(b: Array[Byte], p0: Int): (Value, Int) = {
    val t = b(p0) & 0xff
    var p = p0 + 1
    def takeLong(n: Int): Long = {
      var v = 0L
      (0 until n).foreach { i => v = (v << 8) | (b(p + i) & 0xffL) }
      p += n
      v
    }
    t match {
      case 0xc0 => (Nil, p)
      case 0xc2 => (Bool(false), p)
      case 0xc3 => (Bool(true), p)
      case 0xcb => (Dbl(java.lang.Double.longBitsToDouble(takeLong(8))), p)
      case 0xd3 => (Num(takeLong(8)), p)
      case 0xcc => (Num(takeLong(1)), p)
      case 0xcd => (Num(takeLong(2)), p)
      case 0xce => (Num(takeLong(4)), p)
      case 0xcf => (Num(takeLong(8)), p)
      case x if x < 0x80 => (Num(x.toLong), p)
      case x if x >= 0xe0 => (Num((x - 256).toLong), p)
      case x if (x & 0xe0) == 0xa0 =>
        val len = x & 0x1f
        (Str(new String(b, p, len, StandardCharsets.UTF_8)), p + len)
      case 0xd9 =>
        val len = takeLong(1).toInt
        (Str(new String(b, p, len, StandardCharsets.UTF_8)), p + len)
      case 0xda =>
        val len = takeLong(2).toInt
        (Str(new String(b, p, len, StandardCharsets.UTF_8)), p + len)
      case 0xdb =>
        val len = takeLong(4).toInt
        (Str(new String(b, p, len, StandardCharsets.UTF_8)), p + len)
      case 0xc4 =>
        val len = takeLong(1).toInt
        (Bin(java.util.Arrays.copyOfRange(b, p, p + len)), p + len)
      case 0xc5 =>
        val len = takeLong(2).toInt
        (Bin(java.util.Arrays.copyOfRange(b, p, p + len)), p + len)
      case 0xc6 =>
        val len = takeLong(4).toInt
        (Bin(java.util.Arrays.copyOfRange(b, p, p + len)), p + len)
      case x if (x & 0xf0) == 0x90 =>
        var pp = p
        val items = (0 until (x & 0x0f)).map { _ =>
          val (v, np) = read(b, pp); pp = np; v
        }
        (Arr(items), pp)
      case 0xdc =>
        val n = takeLong(2).toInt
        var pp = p
        val items = (0 until n).map { _ => val (v, np) = read(b, pp); pp = np; v }
        (Arr(items), pp)
      case 0xdd =>
        val n = takeLong(4).toInt
        var pp = p
        val items = (0 until n).map { _ => val (v, np) = read(b, pp); pp = np; v }
        (Arr(items), pp)
      case x if (x & 0xf0) == 0x80 =>
        var pp = p
        val kvs = (0 until (x & 0x0f)).map { _ =>
          val (k, p1) = read(b, pp)
          val (v, p2) = read(b, p1)
          pp = p2
          (k, v)
        }
        (MapV(kvs), pp)
      case 0xde =>
        val n = takeLong(2).toInt
        var pp = p
        val kvs = (0 until n).map { _ =>
          val (k, p1) = read(b, pp)
          val (v, p2) = read(b, p1)
          pp = p2
          (k, v)
        }
        (MapV(kvs), pp)
      case 0xdf =>
        val n = takeLong(4).toInt
        var pp = p
        val kvs = (0 until n).map { _ =>
          val (k, p1) = read(b, pp)
          val (v, p2) = read(b, p1)
          pp = p2
          (k, v)
        }
        (MapV(kvs), pp)
      case other => throw new IllegalArgumentException(f"msgpack type 0x$other%02x unsupported")
    }
  }
}
