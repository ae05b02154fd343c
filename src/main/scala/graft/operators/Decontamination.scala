package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (SURVEY §2.11 north star,
  * round 4): flag training documents that share word n-grams with an
  * evaluation set — the standard overlap check run before training so eval
  * benchmarks aren't leaked into the corpus.
  *
  * Shape at 100 TB: the eval side is always small (benchmarks are thousands
  * of documents, not billions), so its distinct-gram set is broadcast and the
  * corpus side is a single codegen'd scan → explode → broadcast semi-ish
  * join → partial-aggregated count. No corpus-side shuffle other than the
  * final per-doc count; no cartesian anywhere.
  */
object Decontamination {

  /** Per-training-doc count of distinct word `n`-grams shared with the eval
    * set. Tokenization matches [[TextAnalysis.tokens]] (whitespace, empties
    * dropped, lowercased) so the DuckDB oracle composes the same way.
    *
    * @param train corpus side, needs (idCol, text)
    * @param eval  eval-set side, needs (text); assumed small → broadcast
    */
  def sharedGrams(train: DataFrame, eval: DataFrame, n: Int = 5,
                  idCol: String = "doc_id"): DataFrame = {
    def grams(df: DataFrame) = df
      .withColumn("__toks", TextAnalysis.tokens(lower(col("text"))))
      .where(size(col("__toks")) >= n)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => array_join(slice(col("__toks"), i, lit(n)), " ")))).as("gram"))
    val evalGrams = broadcast(grams(eval).select("gram").distinct())
    grams(train).join(evalGrams, "gram")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("shared_grams"))
  }
}
