package graft.tools

/** Standing probe for the graft_double_str shortest-round-trip renderer
  * (r14, closing the r13 ADVICE medium finding: JDK 17's Double.toString
  * is one digit long for ~0.3% of doubles — JDK-4511638 — mostly in
  * 1e17–1e19, where DuckDB's Ryu-style formatter is shortest).
  *
  * Emits `bits<TAB>render` lines for a seeded stream of doubles (uniform
  * bit patterns + the problem magnitudes + knife edges); the dev-side
  * cross-check (dev/dbl_render_check.py) parses the bits back and
  * compares against DuckDB's CAST(x AS VARCHAR) rendering cell-by-cell.
  * No Spark session needed — the kernel's formatter is a pure function.
  *
  * Usage: runMain graft.tools.DoubleRenderProbe [n] [seed]
  */
object DoubleRenderProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val seed = if (args.length > 1) args(1).toLong else 20260816L
    val rnd = new scala.util.Random(seed)
    var emitted = 0
    val sb = new java.lang.StringBuilder()
    def emit(d: Double): Unit = {
      if (!d.isNaN && !d.isInfinite) {
        sb.append(java.lang.Double.doubleToRawLongBits(d)).append('\t')
          .append(graft.functions.DoubleStr.fmtDouble(d)).append('\n')
        emitted += 1
      }
    }
    // FLOAT lines too (r14): `F<bits>\t<render>` — duck renders floats
    // at float-shortest digits; the same JDK-17 long-render and
    // closest-candidate classes apply at 24-bit significands
    def emitF(f: Float): Unit = {
      if (!f.isNaN && !f.isInfinite) {
        sb.append('F')
          .append(java.lang.Float.floatToRawIntBits(f)).append('\t')
          .append(graft.functions.DoubleStr.fmtFloat(f)).append('\n')
      }
    }
    // knife edges first: the advice's verified example + powers-of-ten
    // boundaries of the plain/scientific switch
    emit(-2.6814475343671142e18)
    Seq(1e-5, 1e-4, 1.0, 1e15, 1e16, 0.1, 2.0, -0.0, 1e17, 123456789e10,
      4.35e-18, 9.999999999999999e15).foreach(emit)
    Seq(0.1f, 1e15f, 1e16f, 3.4e38f, 1.5e-5f).foreach(emitF)
    while (emitted < n) {
      (emitted % 4) match {
        // the JDK-4511638 problem band: 1e17–1e19 magnitudes
        case 0 => emit((rnd.nextDouble() - 0.5) * 2e19)
        // general magnitude sweep
        case 1 => emit((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(40) - 20))
        // uniform bit patterns (subnormals, extremes)
        case 2 => emit(java.lang.Double.longBitsToDouble(rnd.nextLong()))
        // float lane: uniform float bits (emitF doesn't bump `emitted`,
        // so pair it with a double to keep the loop total-bounded)
        case _ =>
          emitF(java.lang.Float.intBitsToFloat(rnd.nextInt()))
          emit((rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12)))
      }
    }
    print(sb)
  }
}
