package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.Engine

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY §2.12) runs through the dialect
  * translator + Spark SQL; LLM-pipeline operators (dedup / similarity / text
  * analysis, SURVEY §2.11 north star) are DataFrame programs in
  * [[graft.operators]] with separately-authored DuckDB oracles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The README flagship shape (`/root/reference/README.md:5`): top-k
    * group-by with ClickHouse-isms (zero-arg count, trailing comma). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Engine.registerTables(spark, dir)
    Engine.sql(spark,
      "SELECT o_orderpriority, count() AS c, FROM orders GROUP BY o_orderpriority ORDER BY c DESC, o_orderpriority LIMIT 10")
  }

  private def declared(duckSql: String): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      Engine.registerTables(spark, dir)
      // sqlScript: multi-statement declarations (e.g. CREATE MACRO; SELECT)
      // run each statement and return the last result — DuckDB's con.sql
      // does the same on the oracle side
      Engine.sqlScript(spark, DeclaredQueries.forDir(duckSql, dir))
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DeclaredQueries.all.map { case (name, sql) => name -> declared(sql) }.toMap ++
      DeclaredQueries.asymmetric.map { case (name, (engineSql, _)) =>
        name -> declared(engineSql) }.toMap ++
      operators.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    DeclaredQueries.all.toMap ++
      DeclaredQueries.asymmetric.map { case (name, (_, oracleSql)) =>
        name -> oracleSql }.toMap ++
      operators.PipelineQueries.oracleSql
}
