package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("windowed counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = Streaming.windowedCounts(events, "1 minute", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData((ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0), (ts(1, 5), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("c"), r.getAs[Double]("total"))).toSet
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 10:01:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "event_id", "event_type", "value")

    val q = Streaming.dedupStream(events, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((ts(0), 1L, "a", 1.0), (ts(0), 1L, "a", 1.0), (ts(1), 2L, "b", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("streaming near-dup drops signature-identical docs, keeps distinct ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = Streaming.dedupNearStream(docs)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      val a = "the quick brown fox jumps over the lazy dog again and again"
      input.addData(
        (ts(0), 1L, a),
        (ts(0, 30), 2L, a), // exact dup → same signature → dropped
        (ts(1), 3L, "completely different text with no shared shingles at all here"))
      q.processAllAvailable()
      val ids = spark.table("neardup_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(3L))
      assert((ids - 3L).size == 1, s"expected one survivor of the dup pair, got $ids")
    } finally q.stop()
  }

  test("streaming URL dedup drops cosmetic re-crawls, keeps distinct pages") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val pages = input.toDF().toDF("ts", "page_id", "url")
    val q = Streaming.urlDedupStream(pages)
      .writeStream.format("memory").queryName("urldedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (ts(0), 1L, "HTTP://WWW.Ex.COM:80/a/?utm_source=x&b=2&a=1#frag"),
        (ts(0, 30), 2L, "http://www.ex.com/a?a=1&b=2"), // same canonical → dropped
        (ts(1), 3L, "https://www.ex.com/a?a=1&b=2"))    // different scheme → kept
      q.processAllAvailable()
      val ids = spark.table("urldedup_out").collect()
        .map(_.getAs[Long]("page_id")).toSet
      assert(ids.contains(3L))
      assert((ids - 3L).size == 1, s"expected one survivor of the canon pair, got $ids")
      // the canonical form itself is the dedup key
      val canon = spark.table("urldedup_out").collect()
        .map(_.getAs[String]("__graft_canon")).toSet
      assert(canon.contains("http://www.ex.com/a?a=1&b=2"))
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dimension into each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "source")
    val dim = Seq(("src0", 0.5), ("src1", 2.0)).toDF("source", "weight")

    val q = Streaming.enrichStream(stream, dim)
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, "src0"), (2L, "src1"), (3L, "src_unknown"))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("weight"))).toSet
      // inner join: unknown source drops; weights attach per source
      assert(rows == Set((1L, 0.5), (2L, 2.0)))
      // the static side must have planned as a broadcast join
      val plan = q.lastProgress.sources.length // progress sanity
      assert(plan >= 0)
    } finally q.stop()
  }

  test("streaming span scrub cuts eval windows statelessly per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val ev = Seq(Tuple1("secret bench item alpha")).toDF("text")

    val q = Streaming.scrubStream(stream, ev, k = 3)
      .writeStream.format("memory").queryName("scrubbed")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, "intro words secret bench item tail words"),
        (11L, "clean document nothing shared here"))
      q.processAllAvailable()
      // a second batch exercises statelessness (same scrub, no state)
      input.addData((12L, "secret bench item alpha"))
      q.processAllAvailable()
      val rows = spark.table("scrubbed").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
      assert(rows(10L) == "intro words tail words")
      assert(rows(11L) == "clean document nothing shared here")
      assert(rows(12L) == "")
    } finally q.stop()
  }

  test("broadcast scrub twin is byte-identical to the literal form (r9)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq(Tuple1("secret bench item alpha"),
      Tuple1("another leaked eval phrase here")).toDF("text")
    val docsData = Seq(
      (10L, "intro words secret bench item tail words"),
      (11L, "clean document nothing shared here"),
      (12L, "secret bench item alpha"),
      (13L, "x another leaked eval phrase here y secret bench item z"),
      (14L, ""))

    // literal form through a stream
    val inA = MemoryStream[(Long, String)]
    val qa = Streaming.scrubStream(inA.toDF().toDF("doc_id", "text"), ev, k = 3)
      .writeStream.format("memory").queryName("scrub_lit")
      .outputMode(OutputMode.Append).start()
    // broadcast form through foreachBatch (the documented idiom)
    val digests = Streaming.scrubEvalDigests(ev, k = 3).cache()
    val inB = MemoryStream[(Long, String)]
    val qb = inB.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Streaming.scrubBatchBroadcast(b, digests, k = 3)
          .write.mode("append").saveAsTable("scrub_bc")
      }.start()
    try {
      spark.sql("DROP TABLE IF EXISTS scrub_bc")
      inA.addData(docsData: _*); qa.processAllAvailable()
      inB.addData(docsData: _*); qb.processAllAvailable()
      val lit0 = spark.table("scrub_lit").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val bc = spark.table("scrub_bc").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(lit0.sameElements(bc),
        s"literal=${lit0.toSeq} broadcast=${bc.toSeq}")
      assert(lit0.toMap.apply(13L) == "x y z") // both spans cut
    } finally {
      qa.stop(); qb.stop(); digests.unpersist()
      spark.sql("DROP TABLE IF EXISTS scrub_bc")
    }

    // auto-selection honours the documented threshold
    val small = Streaming.scrubStreamAuto(
      inA.toDF().toDF("doc_id", "text"), ev, k = 3)
    assert(small.isInstanceOf[Streaming.ScrubInline])
    val big = Streaming.scrubStreamAuto(
      inA.toDF().toDF("doc_id", "text"), ev, k = 3, maxLiteralDigests = 1)
    assert(big.isInstanceOf[Streaming.ScrubPerBatch])
    big match {
      case Streaming.ScrubPerBatch(d, _) => d.unpersist(); ()
      case _ => ()
    }
  }

  test("ledgered streaming scrub emits a removal-provenance stream (r8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val ev = Seq(Tuple1("secret bench item alpha")).toDF("text")

    val (kept, ledger) = Streaming.scrubStreamLedgered(stream, ev, k = 3)
    val qk = kept.writeStream.format("memory").queryName("led_kept")
      .outputMode(OutputMode.Append).start()
    val ql = ledger.writeStream.format("memory").queryName("led_ledger")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (10L, "intro words secret bench item tail words"),
        (11L, "clean document nothing shared here"))
      qk.processAllAvailable(); ql.processAllAvailable()
      val keptRows = spark.table("led_kept").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
      assert(keptRows(10L) == "intro words tail words")
      assert(keptRows(11L) == "clean document nothing shared here")
      val led = spark.table("led_ledger").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("op"),
          r.getAs[Long]("detail"), r.getAs[Long]("removed_tokens")))
      // only doc 10 lost tokens: one span of 3 ("secret bench item"),
      // 7 original tokens − 4 kept = 3 removed
      assert(led.toSeq == Seq((10L, "decontam_span", 1L, 3L)), led.toSeq)
    } finally { qk.stop(); ql.stop() }
  }

  test("streaming dataset card keeps running per-source stats (r8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val stream = input.toDF().toDF("source", "text")
    val q = Streaming.datasetCardStream(stream)
      .writeStream.format("memory").queryName("card")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(
        ("web", "the cat and the dog"),
        ("web", "der hund ist nicht das"),
        ("books", "one two three"))
      q.processAllAvailable()
      input.addData(("web", "of a to in is the"))
      q.processAllAvailable()
      val rows = spark.table("card").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      // web: 3 docs, 5+5+6 tokens, 2 en + 1 de
      assert(rows("web") == ((3L, 16L, 2L, 1L)), rows("web"))
      assert(rows("books")._1 == 1L && rows("books")._2 == 3L)
    } finally q.stop()
  }

  test("streaming entropy gate drops low-diversity spam statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = Streaming.entropyGateStream(stream, minBits = 3.0)
      .writeStream.format("memory").queryName("entgated")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, "a diverse sentence with many different words and letters"),
        (2L, "aaa aaa aaa aaa aaa aaa aaa aaa"))
      q.processAllAvailable()
      input.addData((3L, "another batch of varied natural language text"))
      q.processAllAvailable()
      val kept = spark.table("entgated").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 3L))
      assert(spark.table("entgated").columns.contains("ent_bits"))
    } finally q.stop()
  }

  test("stream-stream interval join correlates feeds within the time bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[(Timestamp, Long, String)]
    val scores = MemoryStream[(Timestamp, Long, Double)]
    val left = docs.toDF().toDF("ts", "doc_id", "text")
    val right = scores.toDF().toDF("rts", "doc_id", "score")
    val q = Streaming.correlateStreams(left, right, "doc_id", withinMs = 5000)
      .select("doc_id", "text", "score")
      .writeStream.format("memory").queryName("correlated")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = 1700000000000L
      docs.addData((new Timestamp(t0), 1L, "doc one"),
        (new Timestamp(t0), 2L, "doc two"))
      // doc 1's score arrives 2s later (inside the 5s bound); doc 2's
      // arrives 20s later (outside) and must NOT correlate
      scores.addData((new Timestamp(t0 + 2000), 1L, 0.9),
        (new Timestamp(t0 + 20000), 2L, 0.5))
      q.processAllAvailable()
      // advance both watermarks so state for the missed pair evicts
      docs.addData((new Timestamp(t0 + 60000), 99L, "late"))
      scores.addData((new Timestamp(t0 + 60000), 98L, 0.1))
      q.processAllAvailable()
      val rows = spark.table("correlated").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(rows == Map(1L -> 0.9))
    } finally q.stop()
  }

  test("streaming curation gates quality and language, dedups within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = Streaming.curateStream(docs, minTokens = 10, lang = "en")
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append).start()
    try {
      val en = "the cat and the dog walk to the park in the morning and the evening"
      val de = "der hund und die katze ist nicht im park und das wetter ist nicht gut"
      input.addData(
        (ts(0), 1L, en),
        (ts(0, 30), 2L, en),   // exact dup inside the watermark → dropped
        (ts(1), 3L, "too short"), // quality gate
        (ts(1, 30), 4L, de))   // language gate
      q.processAllAvailable()
      val ids = spark.table("curate_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L), s"expected only doc 1 to survive curation, got $ids")
    } finally q.stop()
  }

  test("sessionization closes sessions after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Streaming.Event]
    val q = Streaming.sessionize(input.toDS(), gapMs = 60000) // 1-minute gap
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10s apart (one session), then 5 minutes silence,
      // then another event (second session); watermark advances via user 2
      input.addData(
        Streaming.Event(1L, ts(0, 0), "a", 1.0),
        Streaming.Event(1L, ts(0, 10), "b", 2.0),
        Streaming.Event(1L, ts(5, 0), "c", 4.0))
      q.processAllAvailable()
      input.addData(Streaming.Event(2L, ts(30, 0), "z", 0.0)) // pushes watermark past session 1+2
      q.processAllAvailable()
      input.addData(Streaming.Event(2L, ts(59, 0), "z", 0.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions").as[Streaming.UserSession].collect()
        .filter(_.user_id == 1L).sortBy(_.start_ms)
      assert(sessions.length >= 1)
      val first = sessions.head
      assert(first.n_events == 2 && first.total_value == 3.0)
      assert(first.end_ms - first.start_ms == 10000)
    } finally q.stop()
  }

  test("file-source watch sees appended batches (reference concurrent-insert parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_watch").toString
    val schema = Seq((ts(0), "click", 1.0)).toDF("ts", "event_type", "value").schema
    Seq((ts(0), "click", 1.0)).toDF("ts", "event_type", "value")
      .write.mode("append").parquet(dir)
    val q = Streaming.watchCounts(spark, dir, schema)
      .writeStream.format("memory").queryName("watch_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      assert(spark.table("watch_counts").collect().map(_.getLong(1)).sum == 1)
      // concurrent writer appends another batch
      Seq((ts(1), "click", 2.0), (ts(1), "view", 1.0)).toDF("ts", "event_type", "value")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(spark.table("watch_counts").collect().map(_.getLong(1)).sum == 3)
    } finally q.stop()
  }
}
