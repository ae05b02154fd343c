package graft.tools
import graft.engine.Engine
object InListProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession("4")
    Engine.registerTables(spark, "/root/testdata/sf0.01")
    for (n <- Seq(1000, 10000, 100000)) {
      val paths = (0 until n).map(i => s"file:/some/long/warehouse/path/part-$i-0aa1bb2cc3dd4ee5ff6-c000.snappy.parquet")
      val inList = paths.map(p => s"'$p'").mkString("(", ", ", ")")
      val sql1 = s"SELECT count(*) FROM orders WHERE o_orderpriority IN $inList"
      var t0 = System.nanoTime()
      spark.sql(sql1).queryExecution.optimizedPlan
      val tLit = (System.nanoTime() - t0) / 1e9
      import spark.implicits._
      paths.toDF("__g_path").createOrReplaceTempView("probe_paths")
      t0 = System.nanoTime()
      spark.sql("SELECT count(*) FROM orders WHERE o_orderpriority IN (SELECT __g_path FROM probe_paths)").queryExecution.optimizedPlan
      val tSub = (System.nanoTime() - t0) / 1e9
      println(f"[inlist] n=$n%7d sqlMB=${sql1.length/1e6}%.2f literal=$tLit%.3fs subquery=$tSub%.3fs")
    }
  }
}
