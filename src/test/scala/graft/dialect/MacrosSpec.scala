package graft.dialect

import graft.SparkTestBase
import graft.engine.Engine

/** DuckDB macro-surface depth (r6, VERDICT r5 #8): overloads by arity,
  * named `:=` call-site arguments (DuckDB's only way to override a
  * defaulted parameter), and table macros with defaults in FROM position. */
class MacrosSpec extends SparkTestBase {

  private def run(sql: String): org.apache.spark.sql.DataFrame =
    Engine.sqlScript(spark, sql)

  test("named := call-site argument overrides a defaulted parameter") {
    val r = run(
      "CREATE OR REPLACE MACRO mx_tax(p, rate := 0.07) AS p * (1 + rate); " +
        "SELECT CAST(round(mx_tax(100)) AS BIGINT) AS dflt, " +
        "CAST(round(mx_tax(100, rate := 0.5)) AS BIGINT) AS named").head
    assert(r.getLong(0) == 107L && r.getLong(1) == 150L)
  }

  test("overloads by arity dispatch to the matching signature") {
    val r = run(
      "CREATE OR REPLACE MACRO mx_add (a) AS a + 1, (a, b) AS a + b, (a, b, c) AS a + b + c; " +
        "SELECT mx_add(10) AS one, mx_add(10, 5) AS two, mx_add(10, 5, 1) AS three").head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((11, 15, 16)))
  }

  test("overload bodies may contain top-level commas (AS TABLE SELECT a, b)") {
    // the overload-boundary scan must not split on a SELECT-list comma,
    // and a parenthesized expression inside a body is not a boundary
    val r = run(
      "CREATE OR REPLACE MACRO mx_t () AS TABLE SELECT 1 AS a, (2 + 0) AS b, 3 AS c; " +
        "SELECT a, b, c FROM mx_t()").head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((1, 2, 3)))
  }

  test("table macro with parameter default in FROM position") {
    val dflt = run(
      "CREATE OR REPLACE MACRO mx_firstn(n := 3) AS TABLE SELECT id FROM range(10) WHERE id < n; " +
        "SELECT count(*) AS c FROM mx_firstn()").head.getLong(0)
    val named = run("SELECT count(*) AS c FROM mx_firstn(n := 5)").head.getLong(0)
    assert(dflt == 3L && named == 5L)
  }

  test("no matching overload leaves the call untouched for Spark to reject") {
    run("CREATE OR REPLACE MACRO mx_one(a) AS a + 1")
    intercept[Exception] { run("SELECT mx_one(1, 2, 3) AS x").collect() }
  }
}
