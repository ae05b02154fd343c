package graft.tools

import graft.engine.Engine
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Doc-LENGTH scaling probe for chunkWindows (r6 verdict task #2): the
  * corpus-growth audit scales row counts, never per-doc length, so a
  * quadratic in doc length hides at any corpus SF. This probe times the
  * operator on single synthetic docs of n, 2n, 4n tokens — linear means
  * ~2× per doubling; the old explode-then-slice shape showed ~4×.
  *
  * Run: `sbt "runMain graft.tools.LongDocProbe [baseTokens]"`.
  */
object LongDocProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toInt else 100000
    val spark = Engine.localSession("4")
    import spark.implicits._
    Seq(1, 2, 4).foreach { mult =>
      val n = base * mult
      // one long doc + a second row so the plan is a real multi-row scan
      val doc = Iterator.range(0, n).map(i => "w" + i).mkString(" ")
      val df = Seq((1L, doc), (2L, "a b c")).toDF("doc_id", "text")
      def run(): Double = {
        val t0 = System.nanoTime()
        TextAnalysis.chunkWindows(df)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup (codegen)
      val t = (1 to 3).map(_ => run()).min
      // r8: token_counts (the tf-idf kernel) on the same doc-length axis —
      // per-doc hash map of distinct terms, linear by construction
      def runTc(): Double = {
        val t0 = System.nanoTime()
        graft.functions.GraftFunctions.register(spark)
        df.selectExpr("size(token_counts(text)) AS c")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      runTc()
      val tc = (1 to 3).map(_ => runTc()).min
      println(f"[longdoc] tokens=$n%7d  chunk_windows min $t%.3f s  token_counts min $tc%.3f s")
    }
    spark.stop()
  }
}
