package graft.tools

/** Dev-only: dump raw grisu digit traces for a float-bits corpus —
  * `B<bits>` header then [[graft.functions.Grisu32.trace]] lines.
  * Consumed by dev/grisu_fit.py together with the duck render dump. */
object Grisu32Trace {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/duck_float_renders.tsv"
    val sb = new StringBuilder
    scala.io.Source.fromFile(path).getLines().foreach { line =>
      val bits = line.split("\t", 2)(0).toInt
      val f = java.lang.Float.intBitsToFloat(bits)
      if (!f.isNaN && !f.isInfinite && f != 0.0f) {
        sb.append(s"B$bits\n")
        sb.append(graft.functions.Grisu32.trace(Math.abs(f)))
      }
    }
    print(sb)
  }
}
