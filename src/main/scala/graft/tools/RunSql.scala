package graft.tools

import graft.engine.Engine

/** Dev-loop: run ONE raw DuckDB-dialect SQL string through the translator +
  * Spark and print schema + first rows — for validating candidate declared
  * queries before wiring them into DeclaredQueries.
  *
  * Run: `sbt "runMain graft.tools.RunSql <sfDir> <sql> [<sql> ...]"` —
  * each arg is one independent statement; failures don't stop the batch.
  */
object RunSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = Engine.localSession()
    Engine.registerTables(spark, sfDir)
    val sqls = args.drop(1).flatMap { a =>
      if (a.startsWith("@"))
        scala.io.Source.fromFile(a.drop(1)).getLines().map(_.trim).filter(_.nonEmpty).toSeq
      else Seq(a)
    }
    sqls.zipWithIndex.foreach { case (sql, i) =>
      println(s"==== [$i] $sql")
      try {
        val df = Engine.sql(spark, sql)
        if (sys.env.contains("GRAFT_EXPLAIN")) df.explain("formatted")
        else { df.printSchema(); df.show(5, truncate = false) }
      } catch {
        case e: Exception =>
          println(s"FAIL [$i]: ${e.toString.linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
