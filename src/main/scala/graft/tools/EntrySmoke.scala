package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]").appName("smoke").getOrCreate()
    val n = graft.SparkEntry.entry(s).count()
    println(s"[smoke] entry rows: $n")
    s.stop()
  }
}
