package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {
  import EventStream._
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("windowed counts over a memory stream match the batch equivalent") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(1), 10, "click", 1.0), Event(2, ts(5), 11, "click", 2.0),
      Event(3, ts(12), 10, "view", 3.0), Event(4, ts(14), 12, "click", 4.0))
    mem.addData(events: _*)
    val q = windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select("window_start", "event_type", "n")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got == Set(
        (ts(0), "click", 2L), (ts(10), "view", 1L), (ts(10), "click", 1L)))
    } finally q.stop()
  }

  test("file stream discovers new files incrementally") {
    val dir = specTempDir("stream-in")
    val batch1 = Seq(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "b", 1.0))
    batch1.toDF().write.parquet(dir.resolve("f1.parquet").toString)
    val q = fromDirectory(spark, dir.toUri.toString + "/*")
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("file_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_out").count() == 2)
      Seq(Event(3, ts(2), 2, "c", 1.0)).toDF()
        .write.parquet(dir.resolve("f2.parquet").toString)
      q.processAllAvailable()
      assert(spark.table("file_out").count() == 3)
    } finally q.stop()
  }

  test("stream-static enrichment join: each micro-batch joins the dim table") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((10L, "gold"), (11L, "silver")).toDF("user_id", "tier")
    val q = mem.toDF().join(dim, Seq("user_id"), "left")
      .groupBy("tier").count()
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      mem.addData(Event(1, ts(0), 10, "a", 1.0), Event(2, ts(1), 12, "b", 1.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(2), 11, "c", 1.0), Event(4, ts(3), 10, "d", 1.0))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .as[(Option[String], Long)].collect().toSet
      assert(got == Set((Some("gold"), 2L), (Some("silver"), 1L), (None, 1L)))
    } finally q.stop()
  }

  test("stateful sessionization counts sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    try {
      // batch 1: two events 5 min apart -> one session
      mem.addData(Event(1, ts(0), 7, "a", 1.0), Event(2, ts(5), 7, "a", 1.0))
      q.processAllAvailable()
      // batch 2: 40-min gap -> second session
      mem.addData(Event(3, ts(45), 7, "a", 1.0))
      q.processAllAvailable()
      val last = spark.table("sess_out")
        .filter(col("user_id") === 7)
        .orderBy(col("n_events").desc).limit(1)
        .as[UserSessions].collect()(0)
      assert(last == UserSessions(7L, 3L, 2L))
    } finally q.stop()
  }

  test("streaming dedup: watermark + dropDuplicates drops re-sent events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("complete").start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "a", 1.0))
      q.processAllAvailable()
      // re-send event 1 (at-least-once upstream) + one new event
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(3, ts(2), 1, "a", 1.0))
      q.processAllAvailable()
      import org.apache.spark.sql.functions.col
      val n = spark.table("dedup_out").collect()(0).getLong(0)
      assert(n == 3, s"expected 3 unique events, got $n")
    } finally q.stop()
  }

  test("stream-stream interval join: clicks joined to purchases within 10 min") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val c = clicks.toDF()
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val b = buys.toDF()
      .select(col("user_id"), col("ts").as("buy_ts"),
        col("value").as("buy_value"))
    val joined = EventStream.intervalJoin(c, "click_ts", b, "buy_ts",
      Seq("user_id"), "10 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Event(1, ts(0), 5, "click", 0.0))
      buys.addData(Event(2, ts(5), 5, "purchase", 9.0),   // within window
        Event(3, ts(20), 5, "purchase", 7.0))             // outside
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("click_id", "buy_value").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.0)))
    } finally q.stop()
  }

  test("interval join: late data is dropped and state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val buys = MemoryStream[Event]
    val c = clicks.toDF()
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val b = buys.toDF()
      .select(col("user_id"), col("ts").as("buy_ts"),
        col("value").as("buy_value"))
    val joined = EventStream.intervalJoin(c, "click_ts", b, "buy_ts",
      Seq("user_id"), "10 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_late")
      .outputMode("append").start()
    try {
      // batch 1: one match inside the interval
      clicks.addData(Event(1, ts(0), 5, "click", 0.0))
      buys.addData(Event(2, ts(5), 5, "purchase", 9.0))
      q.processAllAvailable()
      // batch 2: advance BOTH watermarks far past the old rows
      clicks.addData(Event(3, ts(120), 6, "click", 0.0))
      buys.addData(Event(4, ts(125), 6, "purchase", 1.0))
      q.processAllAvailable()
      // batch 3: a would-match purchase arriving way behind the
      // watermark (ts(2) vs watermark ~ts(110)) must join NOTHING —
      // the click it would match was evicted from state
      buys.addData(Event(5, ts(2), 5, "purchase", 99.0))
      q.processAllAvailable()
      val got = spark.table("ssj_late")
        .select("click_id", "buy_value").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 9.0), (3L, 1.0)),
        s"late purchase must not join: $got")
      // bounded state: the time-range condition lets Spark evict rows
      // older than the state watermark — far fewer buffered rows than
      // events sent; without eviction every row would sit in state
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4,
        s"state should hold only post-watermark rows, got $stateRows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds dedup state by event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = mem.toDF().withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))
      .groupBy().count()
      .writeStream.format("memory").queryName("ddww_out")
      .outputMode("complete").start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(1, ts(0), 1, "a", 1.0))
      q.processAllAvailable()
      assert(spark.table("ddww_out").collect()(0).getLong(0) == 1)
    } finally q.stop()
  }

  test("sessionizeClosed: in-batch gap split emits immediately; the " +
    "open tail closes via event-time timeout and its state row is " +
    "EVICTED") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeClosed(mem.toDS(), watermarkDelay = "5 minutes",
        gapMinutes = 30)
      .writeStream.format("memory").queryName("sessc_out")
      .outputMode("append").start()
    try {
      def us(min: Int): Long = ts(min).toInstant.getEpochSecond * 1000000L
      // one batch, two users: user 7 has a 40-min gap INSIDE the batch
      // (session 1 closes immediately), user 8 stays open
      mem.addData(
        Event(1, ts(0), 7, "a", 1.0), Event(2, ts(5), 7, "a", 1.0),
        Event(3, ts(45), 7, "a", 1.0),
        Event(4, ts(44), 8, "a", 1.0))
      q.processAllAvailable()
      val after1 = spark.table("sessc_out")
        .as[ClosedSession].collect().toSet
      assert(after1 == Set(ClosedSession(7L, us(0), us(5), 2L)), after1)
      // two state rows live: user 7's second session + user 8's first
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 2L)
      // advance the watermark far past both gap deadlines -> both
      // sessions close via timeout and their state rows evict
      mem.addData(Event(5, ts(300), 9, "a", 1.0))
      q.processAllAvailable()
      mem.addData(Event(6, ts(301), 9, "a", 1.0))
      q.processAllAvailable()
      val after2 = spark.table("sessc_out")
        .as[ClosedSession].collect().toSet
      assert(after2.contains(ClosedSession(7L, us(45), us(45), 1L)), after2)
      assert(after2.contains(ClosedSession(8L, us(44), us(44), 1L)), after2)
      // only user 9's open session remains in state — 7 and 8 evicted
      assert(q.lastProgress.stateOperators.map(_.numRowsTotal).sum == 1L,
        "closed users must leave the state store")
    } finally q.stop()
  }

  test("sessionizeClosed: a cross-batch out-of-order event (within the " +
    "watermark delay) MERGES — start widens to min, end never regresses") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionizeClosed(mem.toDS(), watermarkDelay = "5 minutes",
        gapMinutes = 30)
      .writeStream.format("memory").queryName("sessc_ooo")
      .outputMode("append").start()
    try {
      def us(min: Int): Long = ts(min).toInstant.getEpochSecond * 1000000L
      // batch 1: the session opens at min 10 (watermark -> min 5)
      mem.addData(Event(1, ts(10), 7, "a", 1.0))
      q.processAllAvailable()
      // batch 2: an event at min 7 — EARLIER than the open session's
      // span but above the watermark, exactly what the delay permits.
      // session_window semantics: it merges (start = min 7), it must
      // not regress the end to min 7 or trigger a bogus gap split
      mem.addData(Event(2, ts(7), 7, "a", 1.0))
      q.processAllAvailable()
      // advance the watermark far past the gap deadline to close it
      mem.addData(Event(3, ts(300), 9, "a", 1.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(301), 9, "a", 1.0))
      q.processAllAvailable()
      val got = spark.table("sessc_ooo").as[ClosedSession].collect()
        .filter(_.user_id == 7L).toSet
      assert(got == Set(ClosedSession(7L, us(7), us(10), 2L)), got.toString)
      got.foreach(s => assert(s.end_us >= s.start_us,
        s"closed session must never report end < start: $s"))
    } finally q.stop()
  }

  test("sessionizeNative (built-in session_window) is differentially " +
    "identical to sessionizeClosed on in-order input, end shifted by gap") {
    implicit val sqlCtx = spark.sqlContext
    val gapMin = 30
    val gapUs = gapMin.toLong * 60L * 1000000L
    val memA = MemoryStream[Event]
    val memB = MemoryStream[Event]
    val qA = sessionizeClosed(memA.toDS(), watermarkDelay = "5 minutes",
        gapMinutes = gapMin)
      .writeStream.format("memory").queryName("sdiff_fmgws")
      .outputMode("append").start()
    val qB = sessionizeNative(memB.toDS(), watermarkDelay = "5 minutes",
        gapMinutes = gapMin)
      .writeStream.format("memory").queryName("sdiff_native")
      .outputMode("append").start()
    try {
      def us(min: Int): Long = ts(min).toInstant.getEpochSecond * 1000000L
      // three users over four micro-batches: an in-batch gap split
      // (user 7), a cross-batch continuation (user 8), and a watermark
      // flusher (user 9, whose first session also closes)
      val batches = Seq(
        Seq(Event(1, ts(0), 7, "a", 1.0), Event(2, ts(5), 7, "a", 1.0),
          Event(3, ts(44), 8, "a", 1.0)),
        Seq(Event(4, ts(45), 7, "a", 1.0), Event(5, ts(50), 8, "a", 1.0)),
        Seq(Event(6, ts(300), 9, "a", 1.0)),
        Seq(Event(7, ts(600), 9, "a", 1.0)))
      batches.foreach { b =>
        memA.addData(b: _*); qA.processAllAvailable()
        memB.addData(b: _*); qB.processAllAvailable()
      }
      val fmgws = spark.table("sdiff_fmgws").as[ClosedSession]
        .collect().map(s => (s.user_id, s.start_us, s.end_us, s.n_events))
        .toSet
      assert(fmgws == Set(
        (7L, us(0), us(5), 2L), (7L, us(45), us(45), 1L),
        (8L, us(44), us(50), 2L), (9L, us(300), us(300), 1L)), fmgws)
      // built-in window end = last event + gap: shift and compare
      val native = spark.table("sdiff_native")
        .select("user_id", "start_us", "end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect()
        .map { case (u, s, e, n) => (u, s, e - gapUs, n) }.toSet
      assert(native == fmgws,
        s"native session_window must reproduce the custom twin: $native")
    } finally { qA.stop(); qB.stop() }
  }
}
