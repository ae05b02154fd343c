package graft.tools

import graft.dialect.Translator

/** Dev aid: translate ad-hoc SQL and print the emission — no SparkSession,
  * instant feedback on rewrite shape. Args: either a file of queries (one
  * per line, `@/path`) or each arg as one query. */
object TranslateCli {
  def main(args: Array[String]): Unit = {
    val qs = args.toSeq.flatMap { a =>
      if (a.startsWith("@"))
        scala.io.Source.fromFile(a.drop(1)).getLines().map(_.trim)
          .filter(q => q.nonEmpty && !q.startsWith("#")).toSeq
      else Seq(a)
    }
    qs.foreach { q =>
      val out = try Translator.translate(q).sql catch {
        case e: Throwable => s"ERR ${e.getMessage}"
      }
      println(s"$q\n  => $out\n")
    }
  }
}
