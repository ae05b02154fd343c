package graft.tools
import graft.engine.Engine

/** Repro/regression probe for the upstream Spark RewriteDistinctAggregates
  * ClassCastException: listagg(DISTINCT …) WITHIN GROUP + a second
  * distinct-aggregate group (r11, VERDICT r10 #3). The string_agg
  * DISTINCT rewrite routes through collect_set so the shape never reaches
  * the buggy rule; exits non-zero if any probe errs. */
object WgProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession("4")
    Engine.registerTables(spark,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01")
    var bad = 0
    def t(name: String, q: String): Unit =
      try {
        val r = Engine.sql(spark, q).collect().mkString(" ;; ").take(160)
        println(s"$name OK $r")
      } catch { case e: Throwable =>
        bad += 1
        println(s"$name ERR ${e.toString.linesIterator.next().take(200)}")
      }
    val pc = "percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS p50"
    // the formerly-loud shape: DISTINCT string_agg + second distinct group
    t("sa_cd", s"SELECT $pc, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS s, count(DISTINCT o_orderpriority) AS d2 FROM orders WHERE o_orderkey < 100")
    // DESC + three distinct groups, grouped
    t("sa_desc_g", "SELECT o_orderstatus, string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority DESC) AS s, count(DISTINCT o_orderpriority) AS d1, count(DISTINCT o_custkey) AS d2 FROM orders WHERE o_orderkey < 500 GROUP BY o_orderstatus ORDER BY o_orderstatus")
    // 1-arg DISTINCT form (default ',' separator)
    t("sa_1arg", "SELECT string_agg(DISTINCT o_orderstatus ORDER BY o_orderstatus) AS s, count(DISTINCT o_orderpriority) AS d2 FROM orders WHERE o_orderkey < 100")
    // numeric distinct arg: sort must be on the VALUE, not its string
    t("sa_num", "SELECT string_agg(DISTINCT o_orderkey % 12, ',' ORDER BY o_orderkey % 12) AS s FROM orders WHERE o_orderkey < 100")
    // empty group stays NULL like string_agg
    t("sa_empty", "SELECT string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS s FROM orders WHERE o_orderkey < 0")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
