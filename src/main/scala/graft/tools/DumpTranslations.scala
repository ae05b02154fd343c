package graft.tools

import graft.DeclaredQueries
import graft.dialect.Translator

/** Dev aid: print the Spark SQL each declared DuckDB query translates to. */
object DumpTranslations {
  def main(args: Array[String]): Unit =
    DeclaredQueries.all.foreach { case (name, sql) =>
      val t = Translator.translate(sql)
      println(s"-- $name")
      println(t.sql)
      t.views.foreach(v => println(s"--   view: ${v.name} ${v.format} ${v.path}"))
      println()
    }
}
