package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkTestBase {
  import spark.implicits._

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "cold" + i % 50 else "HOT", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count("*").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Partitioning.saltedAgg(df, Seq("k"), 8)(
      Seq(sum("v").as("ps"), count("*").as("pc")),
      Seq(sum("ps").as("s"), sum("pc").as("c")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on a skewed key") {
    val big = (1 to 5000).map(i => (if (i % 5 == 0) 1L else i.toLong % 100, i))
      .toDF("k", "v")
    val small = (0L to 99L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val plain = big.join(small, big("k") === small("k2")).count()
    val salted = Partitioning.saltedJoin(big, small, "k", "k2", 8).count()
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Partitioning.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    Partitioning.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE graft_bkt_a")
    spark.sql("DROP TABLE graft_bkt_b")
  }
}
