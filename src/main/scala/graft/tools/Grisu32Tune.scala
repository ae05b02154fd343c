package graft.tools

/** Dev-only tuner for [[graft.functions.Grisu32]]'s certification
  * conditions against a dumped duck float-render corpus
  * (`/tmp/duck_float_renders.tsv`: `floatBits<TAB>duckRender`).
  * Prints the residual mismatches with the generator's stop-state so the
  * failure band can be aligned with duck's vendored-fmt behavior. */
object Grisu32Tune {
  def main(args: Array[String]): Unit = {
    val path = if (args.length > 0) args(0) else "/tmp/duck_float_renders.tsv"
    var n = 0; var bad = 0
    scala.io.Source.fromFile(path).getLines().foreach { line =>
      val Array(bitsS, duck) = line.split("\t", 2)
      val f = java.lang.Float.intBitsToFloat(bitsS.toInt)
      if (!f.isNaN && !f.isInfinite && f != 0.0f) {
        n += 1
        val rendered = _root_.graft.functions.DoubleStr.fmtFloat(f)
        if (rendered != duck) {
          bad += 1
          if (bad <= 30)
            println(s"MISMATCH bits=$bitsS f=$f duck=$duck graft=$rendered " +
              _root_.graft.functions.Grisu32.debugState(f))
        }
      }
    }
    println(s"checked $n, mismatches $bad")
  }
}
