package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query/oracle registrations for the LLM-training-data pipeline operators
  * (SURVEY §2.11 north star). Filled in by the modules in this package. */
object PipelineQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracleSql: Map[String, String] = Map.empty
}
