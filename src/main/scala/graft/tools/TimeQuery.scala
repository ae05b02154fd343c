package graft.tools

import graft.SparkEntry
import graft.engine.Engine

/** Dev-loop micro-bench: time ONE registered query without paying the full
  * Bench sweep. Warms up once (codegen/JIT), then times `iters` runs
  * through the same noop sink Bench uses.
  *
  * Run: `sbt "runMain graft.tools.TimeQuery <sfDir> <name> [iters]"`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.localSession()
    Engine.registerTables(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name: min ${times.min}%.3f s  median ${times.sorted.apply(times.length / 2)}%.3f s over $iters runs")
    }
    spark.stop()
  }
}
