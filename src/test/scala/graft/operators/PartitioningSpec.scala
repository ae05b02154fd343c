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

  test("salts are deterministic: identical per row across runs and repartitionings") {
    // a retried task must re-salt its rows identically, or a lossy cluster
    // double-counts/drops rows mid-computation
    val df = (1 to 2000).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
    // same data through different partitionings → identical salted agg output
    val a = Partitioning.saltedAgg(df, Seq("k"), 8)(
      Seq(sum("v").as("ps")), Seq(sum("ps").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Partitioning.saltedAgg(df.repartition(13), Seq("k"), 8)(
      Seq(sum("v").as("ps")), Seq(sum("ps").as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // and the salt expression itself is a pure function of the row
    val salted = df.withColumn("__graft_salt",
      pmod(xxhash64(col("k"), col("v")), lit(8L)))
    val s1 = salted.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val s2 = salted.repartition(5).collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(s1 == s2)
  }

  test("compactTable collapses many tiny append files, preserves content, survives re-run") {
    spark.sql("DROP TABLE IF EXISTS graft_compact_t")
    spark.sql("DROP TABLE IF EXISTS graft_compact_t__compacting")
    // simulate append-per-commit ingest: 20 tiny single-partition appends
    (1 to 20).foreach { i =>
      Seq((i.toLong, s"row$i")).toDF("id", "s").coalesce(1)
        .write.format("parquet").mode("append").saveAsTable("graft_compact_t")
    }
    val expected = spark.table("graft_compact_t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val (before, after) = Partitioning.compactTable(spark, "graft_compact_t",
      targetBytesPerFile = 1L << 30)
    assert(before >= 20, s"expected >=20 ingest files, saw $before")
    assert(after == 1, s"expected 1 compacted file, saw $after")
    val got = spark.table("graft_compact_t")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected, "compaction changed table content")
    // idempotent re-run (crash-safety posture: tmp table is overwritten)
    val (_, after2) = Partitioning.compactTable(spark, "graft_compact_t",
      targetBytesPerFile = 1L << 30)
    assert(after2 == 1)
    assert(spark.table("graft_compact_t").count() == 20)
    spark.sql("DROP TABLE graft_compact_t")
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
