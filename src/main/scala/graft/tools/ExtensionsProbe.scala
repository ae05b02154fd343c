package graft.tools

import org.apache.spark.sql.SparkSession

/** Verifies the `spark.sql.extensions=graft.functions.GraftExtensions`
  * deployment path: functions must resolve in SQL with no runtime
  * registration call. Run in a fresh JVM (`sbt "runMain ..."`). */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT graft_version() AS v, cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c, " +
        "simhash64(array('a','b')) AS sh").head
    println(s"EXTENSIONS_OK v=${r.getString(0)} cos=${r.getDouble(1)} sh=${r.getLong(2)}")
    spark.stop()
  }
}
