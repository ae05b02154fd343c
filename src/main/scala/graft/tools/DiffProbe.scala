package graft.tools

import graft.engine.Engine

/** Differential fuzz harness (r8): run each query from a file through the
  * engine and print ONE canonical line per query —
  * `IDX<TAB>OK<TAB>v1|v2|…` (rows sorted, values normalized: doubles to
  * 6dp, NULL literal, arrays bracketed) or `IDX<TAB>ERR<TAB>message`.
  * `dev/diff_probe.py` prints the same canonicalization from DuckDB; the
  * diff of the two outputs is the divergence report. Queries here are
  * deliberately OUTSIDE the declared set — this is how silent dialect
  * gaps get found before a user does.
  *
  * Run: `sbt "runMain graft.tools.DiffProbe <sfDir> <queryFile>"`. */
object DiffProbe {
  def norm(v: Any): String = v match {
    case null => "NULL"
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      // r12 num fuzz: finite doubles beyond 1e15 — %.6f expands ~17
      // significant digits then pads zeros while python's repr prints the
      // shortest round-trip, so IDENTICAL doubles rendered differently;
      // canonical 9-sig-digit scientific on both sides
      else if (!d.isInfinite && !d.isNaN && math.abs(d) >= 1e15) f"$d%.9e"
      else f"$d%.6f"
    case f: Float => norm(f.toDouble)
    case b: java.math.BigDecimal =>
      // integral decimals print exactly (duck's HUGEINT comes back as a
      // python int on the twin side; the double route lost precision past
      // 2^53 — r10 batch 8)
      if (b.stripTrailingZeros.scale <= 0) b.toBigInteger.toString
      else norm(b.doubleValue())
    case d: java.math.BigInteger => d.toString
    case s: collection.Seq[_] => s.map(norm).mkString("[", ",", "]")
    case a: Array[Byte] => a.map("%02x".format(_)).mkString
    case m: collection.Map[_, _] =>
      m.toSeq.map { case (k, v2) => norm(k) + ":" + norm(v2) }
        .sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      // named structs render {field:value,…} to line up with DuckDB's
      // python dicts (r9 batch-4 canonicalization); schema-less rows
      // (rare: manual Row construction) keep the tuple form
      if (r.schema != null) {
        // positional structs (arrays_zip: fields "0".."n-1") render as
        // lists — DuckDB's client renders list_zip tuples that way (r9)
        val names = r.schema.fieldNames
        // positional field names — "0".."n-1" (arrays_zip) or Spark's
        // struct() defaults "col1".."colN" (duck's row() renders those
        // as plain tuples → lists on the twin side; r10 batch 9)
        if (names.zipWithIndex.forall { case (n, i) => n == i.toString } ||
            names.zipWithIndex.forall { case (n, i) => n == s"col${i + 1}" })
          r.toSeq.map(norm).mkString("[", ",", "]")
        else names.zip(r.toSeq)
          .map { case (n, v) => s"$n:${norm(v)}" }
          .sorted.mkString("{", ",", "}")
      } else r.toSeq.map(norm).mkString("(", ",", ")")
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    // day-time intervals canonicalize to seconds on both sides (the
    // python twin renders timedelta.total_seconds())
    case d: java.time.Duration => norm(d.getSeconds + d.getNano / 1e9)
    // year-month intervals flatten the same way duck's python client
    // does: 30-day months → seconds (r10 batch 9; the old "Nmo" form
    // could never match the twin)
    case p: java.time.Period => norm(p.toTotalMonths * 2592000.0)
    // CalendarInterval (the age() decomposition): duckdb's python client
    // converts month-bearing intervals to timedelta with 30-day months —
    // mirror that so both sides canonicalize to the same seconds
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      norm(ci.months * 2592000.0 + ci.days * 86400.0 + ci.microseconds / 1e6)
    case other => other.toString
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, file) = (args(0), args(1))
    val spark = Engine.localSession("4")
    // REPLICA mode (r14/r15): this harness diffs against the LOCAL
    // DuckDB 1.0.0, which truncates decimal->decimal downscales and
    // epsilon-rounds double->decimal; the driver's newer oracle differs
    // on both (r15 defaults: half-even, nearbyint). Pin the kernel to
    // the replica here so 1.0.0-adjudicated probe batches stay
    // comparable — the driver-facing defaults are covered by the
    // q224/q236-q247 fingerprint family.
    spark.conf.set("spark.graft.replicaMode", "true")
    Engine.registerTables(spark, sfDir)
    val qs = scala.io.Source.fromFile(file).getLines()
      .map(_.trim).filter(q => q.nonEmpty && !q.startsWith("#")).toSeq
    qs.zipWithIndex.foreach { case (q, i) =>
      val line = try {
        // sqlScript so ';'-separated DML round-trip probes (r11) execute
        // whole-script with the final statement's rows compared — for a
        // single statement it is exactly Engine.sql
        val rows = Engine.sqlScript(spark, q).collect().take(100)
          .map(_.toSeq.map(norm).mkString("|")).sorted.mkString(" ;; ")
        s"$i\tOK\t$rows"
      } catch {
        case e: Throwable =>
          s"$i\tERR\t${e.toString.linesIterator.next().take(120)}"
      }
      println(line)
    }
    spark.stop()
  }
}
