package graft.tools

import graft.SparkEntry
import graft.engine.Engine

/** Dump `.explain("formatted")` for registered entries to files — the
  * r16 optimization-round evidence trail (plans/r16/<name>_<tag>.txt).
  *
  * Run: `sbt "runMain graft.tools.ExplainEntry <sfDir> <outDir> <tag> <names>"`.
  *
  * Note: building an entry's DataFrame can itself run Spark jobs
  * (iterative operators checkpoint per round), so the dumped plan is the
  * FINAL lineage fragment (post-checkpoint) plus the terminal operators —
  * exactly the fragment a bench iteration re-executes per run.
  */
object ExplainEntry {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = Engine.localSession()
    Engine.registerTables(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      println(s"[explain] wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
