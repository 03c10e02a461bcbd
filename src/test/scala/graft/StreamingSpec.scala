package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, posexplode, window}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate incrementally with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(2), 2, "click", 2.0),
        Event(3, ts(7), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the earlier windows
      input.addData(Event(4, ts(40), 1, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2) // 10:00-05 click n=2, 10:05-10 view n=1
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(0).getAs[Double]("sum_value") == 3.0)
      assert(rows(1).getAs[String]("event_type") == "view")
    } finally q.stop()
  }

  test("windowed distinct estimate is bounded by m and matches the formula") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val m = 16
    val q = EventStream.windowedDistinctEst(input.toDF(), "user_id",
      m = m, watermarkDelay = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("wde")
      .outputMode("append").start()
    try {
      // 40 distinct users into one window: the per-window state is
      // the bucket SET — at most m elements however many users arrive
      input.addData((1 to 40).map(i =>
        Event(i.toLong, ts(1), i.toLong, "click", 1.0)): _*)
      q.processAllAvailable()
      input.addData(Event(99, ts(40), 1, "click", 1.0)) // close it
      q.processAllAvailable()
      val r = spark.table("wde").orderBy("window_start").collect()(0)
      val nb = r.getAs[Long]("n_buckets")
      assert(nb >= 1 && nb <= m)
      val want =
        if (nb < m) math.rint(-m.toDouble *
          math.log((m - nb).toDouble / m) * 1e6) / 1e6
        else m.toDouble
      assert(r.getAs[Double]("est_distinct") == want)
    } finally q.stop()
  }

  test("custom heap aggregate runs as streaming state with k-bounded buffers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(graft.expr.TopKByScore.topK(col("value"), col("event_id"), 2)
        .as("nb"))
      .select(col("window.start").as("ws"), posexplode(col("nb")))
      .select(col("ws"), (col("pos") + 1).as("rank"),
        col("col.id").as("event_id"), col("col.score").as("value"))
      .writeStream.format("memory").queryName("stopk")
      .outputMode("append").start()
    try {
      // 5 events, one window: only the top-2 by (value desc, id asc)
      // may surface; the merge path runs when partials combine
      input.addData(
        Event(1, ts(1), 1, "a", 5.0), Event(2, ts(1), 1, "a", 9.0),
        Event(3, ts(2), 1, "a", 7.0), Event(4, ts(2), 1, "a", 9.0),
        Event(5, ts(3), 1, "a", 1.0))
      q.processAllAvailable()
      input.addData(Event(9, ts(40), 1, "a", 0.0)) // close the window
      q.processAllAvailable()
      val got = spark.table("stopk").orderBy("rank")
        .select("rank", "event_id", "value")
        .as[(Int, Long, Double)].collect().toSeq
      assert(got == Seq((1, 2L, 9.0), (2, 4L, 9.0)))
    } finally q.stop()
  }

  test("file-source stream over the real events parquet aggregates correctly") {
    val src = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val q = EventStream.windowedCounts(
      EventStream.fromEventsDir(spark, src.toString), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("fc")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val total = spark.table("fc")
        .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
      val batchTotal = Tables.events(spark, "/root/testdata/sf0.001").count()
      assert(total == batchTotal) // stream totals == batch totals
    } finally q.stop()
  }

  test("streaming sessionization agrees with the batch q_sessionize query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: per-user session counts (30-min gap on ts_sec)
    val batch = SparkEntry.queries("q_sessionize")(spark, dir)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap

    // stream the same events; a far-future sentinel pushes the
    // watermark so every real session closes and emits
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("ts_sec").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.Event].collect().toSeq
    val sentinel = EventStream.Event(Long.MaxValue,
      Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("parity")
      .outputMode("append").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      input.addData(sentinel)
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue - 1,
        Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "sentinel2", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("parity")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("a late in-watermark event extends the open session's start backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_back")
      .outputMode("append").start()
    try {
      // batch 1: the session opens at 10:00
      input.addData(EventStream.Event(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: a LATE event at 09:59 merges in FRONT of the open
      // session (negative delta). A globally-sorted batch
      // sessionization starts this session at 09:59 — so must the
      // stream (the old code kept start at 10:00).
      input.addData(EventStream.Event(2L,
        Timestamp.valueOf("2024-01-01 09:59:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // far-future sentinels close and flush the session
      input.addData(EventStream.Event(Long.MaxValue,
        Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue - 1,
        Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "sentinel2", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_back").filter(col("user_id") === 7L)
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().toSeq
      assert(got == Seq((Timestamp.valueOf("2024-01-01 09:59:00"),
        Timestamp.valueOf("2024-01-01 10:00:00"), 2L)))
    } finally q.stop()
  }

  test("two mutually-in-gap stragglers merge into one session, as the batch pass would") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_straggle")
      .outputMode("append").start()
    try {
      // batch 1: the session opens at 10:00
      input.addData(EventStream.Event(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: two LATE events, each > gap before the open session's
      // start but within gap of each other. A globally-sorted batch
      // pass makes them ONE two-event session (08:00–08:10); the old
      // straggler branch closed each alone.
      input.addData(
        EventStream.Event(2L, Timestamp.valueOf("2024-01-01 08:00:00"),
          7L, "view", 0.0),
        EventStream.Event(3L, Timestamp.valueOf("2024-01-01 08:10:00"),
          7L, "view", 0.0))
      q.processAllAvailable()
      // far-future sentinels close and flush the open session
      input.addData(EventStream.Event(Long.MaxValue,
        Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue - 1,
        Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "sentinel2", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_straggle").filter(col("user_id") === 7L)
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().sortBy(_._1.getTime).toSeq
      assert(got == Seq(
        (Timestamp.valueOf("2024-01-01 08:00:00"),
          Timestamp.valueOf("2024-01-01 08:10:00"), 2L),
        (Timestamp.valueOf("2024-01-01 10:00:00"),
          Timestamp.valueOf("2024-01-01 10:00:00"), 1L)), s"got=$got")
    } finally q.stop()
  }

  test("a straggler chain bridged to the open session by a late event merges whole") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("sess_bridge")
      .outputMode("append").start()
    try {
      // batch 1: the session opens at 10:00
      input.addData(EventStream.Event(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: a straggler at 09:10 (> gap before 10:00) plus a
      // bridge at 09:35 (within gap of both) — the globally-sorted
      // pass makes ONE 3-event session 09:10–10:00
      input.addData(
        EventStream.Event(2L, Timestamp.valueOf("2024-01-01 09:10:00"),
          7L, "view", 0.0),
        EventStream.Event(3L, Timestamp.valueOf("2024-01-01 09:35:00"),
          7L, "view", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue,
        Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue - 1,
        Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "sentinel2", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_bridge").filter(col("user_id") === 7L)
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().toSeq
      assert(got == Seq((Timestamp.valueOf("2024-01-01 09:10:00"),
        Timestamp.valueOf("2024-01-01 10:00:00"), 3L)), s"got=$got")
    } finally q.stop()
  }

  test("a straggler chain is HELD until the watermark seals it — a later bridge still joins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 1800,
      watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("sess_hold")
      .outputMode("append").start()
    try {
      // batch 1: session opens at 10:00 (watermark after: 09:00)
      input.addData(EventStream.Event(1L,
        Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: a straggler at 09:15 — 45 min before the open
      // session (> gap), but its own seal time 09:45 is past the
      // 09:00 watermark, so it must be HELD, not emitted (the old
      // sweep emitted every non-final chain immediately)
      input.addData(EventStream.Event(2L,
        Timestamp.valueOf("2024-01-01 09:15:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      assert(spark.table("sess_hold").filter(col("user_id") === 7L)
        .count() == 0, "straggler chain emitted before its seal time")
      // batch 3: a bridge at 09:40 — within gap of BOTH chains; the
      // batch oracle makes ONE 3-event session 09:15–10:00, and so
      // must the stream (early emission would have split it forever)
      input.addData(EventStream.Event(3L,
        Timestamp.valueOf("2024-01-01 09:40:00"), 7L, "view", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue,
        Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0))
      q.processAllAvailable()
      input.addData(EventStream.Event(Long.MaxValue - 1,
        Timestamp.valueOf("2031-01-01 00:00:00"), -1L, "sentinel2", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_hold").filter(col("user_id") === 7L)
        .select("session_start", "session_end", "n_events")
        .as[(Timestamp, Timestamp, Long)].collect().toSeq
      assert(got == Seq((Timestamp.valueOf("2024-01-01 09:15:00"),
        Timestamp.valueOf("2024-01-01 10:00:00"), 3L)), s"got=$got")
    } finally q.stop()
  }

  test("built-in session_window agrees with batch query and custom state op") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q_sessionize")(spark, dir)
      .select("user_id", "n_sessions").as[(Long, Long)].collect().toMap
    // batch-mode session_window over the same events (no watermark)
    val sw = EventStream.sessionWindows(
      Tables.events(spark, dir).select(col("ts_sec").as("ts"), col("user_id")),
      gap = "30 minutes", watermarkDelay = None)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(sw == batch)
  }

  test("streaming exact dedup keeps first arrival, drops watermark-horizon dupes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.dedupExact(
      input.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), "the quick brown fox"),
        (2L, ts(1), "the  quick   brown fox"), // ws-normalized dupe of 1
        (3L, ts(2), "a different document"))
      q.processAllAvailable()
      // same fingerprint again within the horizon: still a dupe
      input.addData((4L, ts(5), "the quick brown fox"))
      q.processAllAvailable()
      val kept = spark.table("dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L), s"kept=$kept")
    } finally q.stop()
  }

  test("streaming segment dedup keeps first span arrival across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def span(p: String) = (0 until 8).map(i => s"$p$i").mkString(" ")
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.dedupSegments(
      input.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("segdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), span("a") + " " + span("b")))
      q.processAllAvailable()
      // batch 2: span "a" repeats (drops), span "c" is new (kept) —
      // the cross-batch state the single-batch gate cannot exercise
      input.addData((2L, ts(3), span("a") + " " + span("c")))
      q.processAllAvailable()
      val kept = spark.table("segdedup")
        .select("doc_id", "seg_idx").as[(Long, Long)].collect().toSet
      assert(kept == Set((1L, 0L), (1L, 1L), (2L, 1L)), s"kept=$kept")
    } finally q.stop()
  }

  test("streaming CDC-chunk dedup keeps first chunk arrival across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val input = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.dedupCdcChunks(
      input.toDF().toDF("doc_id", "ts", "text"),
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("cdcdedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), base))
      q.processAllAvailable()
      val batch1 = spark.table("cdcdedup")
        .select("doc_id", "off", "len").as[(Long, Int, Int)].collect()
      assert(batch1.nonEmpty && batch1.forall(_._1 == 1L))
      // chunks cover the document exactly (the batch chunker contract
      // holds through the stream plumbing)
      assert(batch1.map(_._3).sum == base.getBytes("UTF-8").length)
      // batch 2: a verbatim re-scrape dedups to ZERO kept chunks (all
      // fps live in batch-1 state — the cross-batch store the
      // single-batch gate cannot exercise); fresh content is kept
      input.addData((2L, ts(3), base), (3L, ts(4), "entirely new words"))
      q.processAllAvailable()
      val all = spark.table("cdcdedup")
        .select("doc_id").as[Long].collect().toSeq
      assert(!all.contains(2L), s"re-scraped chunks re-admitted: $all")
      assert(all.contains(3L), s"fresh chunks dropped: $all")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.sessionize(input.toDS(), gapSeconds = 600,
      watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // user 1: two events 3 min apart (one session), then 20 min gap
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(3), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(3, ts(23), 1, "click", 1.0)) // gap > 10 min
      q.processAllAvailable()
      // push watermark forward so the open session times out
      input.addData(Event(4, ts(59), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(5, Timestamp.valueOf("2024-01-01 12:00:00"), 2, "x", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .orderBy("session_start").as[EventStream.Session].collect()
      assert(sessions.length >= 2)
      assert(sessions(0).user_id == 1)
      assert(sessions(0).n_events == 2) // 10:00 + 10:03
      assert(sessions(0).session_start == ts(0))
      assert(sessions(0).session_end == ts(3))
      assert(sessions(1).n_events == 1) // the 10:23 singleton
    } finally q.stop()
  }

  test("streaming trending-term counts equal the batch window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.TrendingTerms.windowedTermCounts(
      input.toDS().toDF("id", "text", "ts"),
      textCol = "text", tsCol = "ts",
      watermarkDelay = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("trend")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "spark spark table", ts(1)),
        (2L, "table spark", ts(2)),
        (3L, "join join join join", ts(7))) // second window
      q.processAllAvailable()
      input.addData((4L, "late late", ts(40))) // watermark flush
      q.processAllAvailable()
      // window 10:00-05: spark x3, table x2; window 10:05-10: join x4
      val rows = spark.table("trend")
        .filter(col("window_start") < lit(ts(10)))
        .select("window_start", "tok", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows == Set(
        (ts(0), "spark", 3L), (ts(0), "table", 2L), (ts(5), "join", 4L)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the dim per batch and drops non-matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((0L, "ZERO"), (1L, "ONE")).toDF("k", "name")
    val input = MemoryStream[Event]
    val q = EventStream.enrichedWindowedCounts(
      input.toDF(), dim,
      joinCond = col("user_id") % 2 === col("k"),
      dimVal = col("name"),
      watermarkDelay = "10 minutes", windowLen = "5 minutes")
      .writeStream.format("memory").queryName("enr")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(1), 2, "click", 1.0), // user 2 → k=0 ZERO
        Event(2, ts(2), 4, "click", 1.0), // user 4 → k=0 ZERO
        Event(3, ts(3), 5, "view", 1.0),  // user 5 → k=1 ONE
        Event(4, ts(4), -1, "noise", 1.0)) // -1 % 2 = -1: no dim match
      q.processAllAvailable()
      input.addData(Event(5, ts(40), 2, "click", 1.0)) // flush watermark
      q.processAllAvailable()
      val rows = spark.table("enr").filter(col("window_start") < lit(ts(10)))
        .select("dim", "n").as[(String, Long)].collect().toSet
      // the unmatched user_id=-1 row advanced the watermark but never
      // reached the aggregate — structural sentinel drop
      assert(rows == Set(("ZERO", 2L), ("ONE", 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join emits exactly the in-horizon pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.intervalJoin(
      input.toDF(), leftType = "view", rightType = "click",
      horizonSec = 300L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(1), 7, "view", 1.0),
        Event(2, ts(3), 7, "click", 1.0), // +120 s: in horizon
        Event(3, ts(9), 7, "click", 1.0), // +480 s: out of horizon
        Event(4, ts(2), 8, "click", 1.0), // other user: no pair
        Event(5, ts(2), 9, "view", 1.0))  // no click for user 9
      q.processAllAvailable()
      // the click arriving AFTER the view's micro-batch still matches
      // (the view is buffered in join state until the horizon passes)
      input.addData(Event(6, ts(4), 9, "click", 1.0)) // +120 s for view 5
      q.processAllAvailable()
      val rows = spark.table("sj")
        .select("l_id", "r_id", "user_id", "delta_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows == Set(
        (1L, 2L, 7L, 120000000L),
        (5L, 6L, 9L, 120000000L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched lefts after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.intervalJoin(
      input.toDF(), leftType = "view", rightType = "click",
      horizonSec = 300L, watermarkDelay = "1 minutes",
      joinType = "left_outer")
      .writeStream.format("memory").queryName("sjo")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(1), 7, "view", 1.0),  // matched below
        Event(2, ts(3), 7, "click", 1.0),
        Event(3, ts(2), 8, "view", 1.0))  // never matched
      q.processAllAvailable()
      // advance BOTH sides' watermarks past view 3's horizon
      input.addData(
        Event(4, ts(30), 99, "view", 1.0),
        Event(5, ts(30), 98, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sjo")
        .filter(col("user_id") < 90)
        .select("l_id", "user_id").as[(Long, Long)].collect().toSet
      // the matched pair emitted eagerly; the unmatched view emitted
      // null-matched only after the watermark passed its horizon
      assert(rows == Set((1L, 7L), (3L, 8L)))
      val unmatched = spark.table("sjo").filter(col("l_id") === 3)
        .select("r_id").collect()
      assert(unmatched.length == 1 && unmatched.head.isNullAt(0))
    } finally q.stop()
  }
}
