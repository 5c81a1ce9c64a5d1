package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Structured Streaming smoke (SURVEY.md §2B last row): the same window
  * transforms run on a MemoryStream with watermarks; stateful dedup drops
  * in-horizon duplicates. */
case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double, ts: Timestamp)
case class Imp(imp_id: Long, user_id: Long, imp_ts: Timestamp)
case class Clk(click_id: Long, user_id: Long, click_ts: Timestamp)

class StreamingSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streaming tumbling window with watermark aggregates by event time") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 1.0, ts(2)),
      Ev(3, 2, "view", 2.0, ts(16)), Ev(4, 2, "click", 1.0, ts(17)))
    val out = Streams.streamTumblingCounts(mem.toDF(), "15 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = s.sql("SELECT window_start, event_type, n FROM tumbling ORDER BY window_start, event_type")
        .collect()
      assert(rows.length == 3)
      assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate event_ids") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(1, 1, "click", 1.0, ts(2)), // dup id
      Ev(2, 1, "view", 2.0, ts(3)))
    val out = Streams.streamDedup(mem.toDF(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(s.sql("SELECT count(*) FROM dedup").first().getLong(0) == 2L)
    } finally q.stop()
  }

  test("file-source readStream over events parquet matches the batch result") {
    val s = spark
    // streaming read of the same parquet the batch path uses; the ts
    // column is normalized the same way as sources.Tables (layout-adaptive)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sf = "/root/testdata/sf0.001"
    // the file source requires a directory; stage the file via symlink
    val dir = tempDir("graft-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamTumblingCounts(stream, "1 hour", "1 minute")
    val q = out.writeStream.format("memory").queryName("filestream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT window_start, event_type, n FROM filestream")
        .orderBy("window_start", "event_type").collect()
      val batch = Streams.tumblingCounts(
          graft.sources.Tables.t(s, sf, "events"), "1 hour")
        .select(col("window_start"), col("event_type"), col("n"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("native session_window stream matches the batch sessionization on the same data") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = Seq(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 1.0, ts(2)),   // u1 session A
      Ev(3, 2, "view", 2.0, ts(5)),                                    // u2 session A
      Ev(4, 1, "click", 1.0, Timestamp.valueOf("2024-01-01 11:00:00")), // u1 session B
      Ev(5, 2, "view", 1.0, Timestamp.valueOf("2024-01-01 11:30:00"))) // u2 session B
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(3))
    val out = Streams.streamSessionCounts(mem.toDF(), "30 minutes", "0 seconds")
    val q = out.writeStream.format("memory").queryName("nativesess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(evs.drop(3)) // advances the watermark past A's session ends
      q.processAllAvailable()
      val streamed = s.sql(
          "SELECT session_start, session_end, user_id, n FROM nativesess")
        .orderBy("user_id", "session_start").collect()
      // append mode emits exactly the sessions whose end the watermark
      // (max event time, delay 0 → 11:30) has passed; assert the stream
      // matches the batch operator on that closed subset
      val batch = Streams.sessionCounts(evs.toDF(), "30 minutes")
        .where(col("session_end") <= lit(Timestamp.valueOf("2024-01-01 11:30:00")))
        .orderBy("user_id", "session_start").collect()
      assert(batch.length == 3)
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
        s"stream ${streamed.map(_.toSeq).mkString} != batch ${batch.map(_.toSeq).mkString}")
    } finally q.stop()
  }

  test("b65: running session_window stream over events equals the oracle parity query") {
    // the b65 oracle contract: after the file-source stream drains the
    // whole events table, the append-mode native session_window output
    // (gap 30 min, delay 30 min) equals SparkEntry's batch parity query
    // (sessions with end <= max(ts) - delay) on the same data
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-sess-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamSessionCounts(stream, "30 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("sessparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
          "SELECT session_start, session_end, user_id, n FROM sessparity")
        .orderBy("user_id", "session_start").collect()
      val oracle = SparkEntry.queries("b65_stream_session_parity")(s, sf).collect()
      assert(streamed.length > 0, "stream emitted nothing — watermark never advanced?")
      assert(streamed.map(_.toSeq).toSeq == oracle.map(_.toSeq).toSeq,
        s"stream rows=${streamed.length} != parity query rows=${oracle.length}")
    } finally q.stop()
  }

  test("b78: running windowed HLL-distinct stream equals the batch aggregation bit-for-bit") {
    // HLL partial states merge by register max, so arrival order cannot
    // change the estimate: the drained stream's append output must equal
    // the batch approx_count_distinct on the closed windows exactly —
    // not just within the error bound
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-hll-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamTumblingDistinct(stream, "1 hour", "30 minutes")
    val q = out.writeStream.format("memory").queryName("hllparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT window_start, approx_users FROM hllparity")
        .orderBy("window_start").collect().map(_.toSeq).toSeq
      val ev = graft.sources.Tables.t(s, sf, "events")
      val wmRow = ev.agg(org.apache.spark.sql.functions.max(col("ts"))).head().getTimestamp(0)
      val wm = new java.sql.Timestamp(wmRow.getTime - 30 * 60 * 1000)
      val batch = ev.groupBy(org.apache.spark.sql.functions.window(col("ts"), "1 hour"))
        .agg(org.apache.spark.sql.functions.approx_count_distinct(col("user_id"), 0.05)
          .as("approx_users"))
        .where(col("window.end") <= lit(wm))
        .select(col("window.start").as("window_start"), col("approx_users"))
        .orderBy("window_start").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty, "stream emitted nothing — watermark never advanced?")
      assert(streamed == batch,
        s"stream rows=${streamed.length} != batch rows=${batch.length}")
    } finally q.stop()
  }

  test("b91: sliding-window HLL-distinct stream equals the batch aggregation bit-for-bit") {
    // the overlap (width/slide = 2 windows per event) is a deterministic
    // ASSIGNMENT; the per-window register-max merge algebra is untouched,
    // so closed sliding windows must match batch exactly, same as b78
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-hll-slide-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamSlidingDistinct(stream, "1 hour", "30 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("hllslideparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT window_start, approx_users FROM hllslideparity")
        .orderBy("window_start").collect().map(_.toSeq).toSeq
      val ev = graft.sources.Tables.t(s, sf, "events")
      val wmRow = ev.agg(org.apache.spark.sql.functions.max(col("ts"))).head().getTimestamp(0)
      val wm = new java.sql.Timestamp(wmRow.getTime - 30 * 60 * 1000)
      val batch = ev.groupBy(
          org.apache.spark.sql.functions.window(col("ts"), "1 hour", "30 minutes"))
        .agg(org.apache.spark.sql.functions.approx_count_distinct(col("user_id"), 0.05)
          .as("approx_users"))
        .where(col("window.end") <= lit(wm))
        .select(col("window.start").as("window_start"), col("approx_users"))
        .orderBy("window_start").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty, "stream emitted nothing — watermark never advanced?")
      assert(streamed == batch,
        s"stream rows=${streamed.length} != batch rows=${batch.length}")
    } finally q.stop()
  }

  test("funnelWithState closes a user's funnel exactly like the batch stage machine") {
    // small controlled case: u1 completes view->click->purchase with a
    // late-arriving EARLIER view that lowers s1 and changes which click
    // qualifies as s2 (the case an incremental stage-pointer machine gets
    // wrong and buffer-until-close gets right); u2 clicks before any
    // view (funnel stalls at s1); u3 keeps the watermark open and emits
    // nothing
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // u1: click@2 precedes view@5 (doesn't qualify), click@10 qualifies
    //     against view@5... until the LATE view@1 arrives in batch 2 and
    //     makes click@2 the true s2; purchase@12 follows
    mem.addData(
      Ev(1, 1, "view", 0, ts(5)), Ev(2, 1, "click", 0, ts(2)),
      Ev(3, 1, "click", 0, ts(10)), Ev(4, 1, "purchase", 0, ts(12)),
      Ev(5, 2, "click", 0, ts(3)), Ev(6, 2, "view", 0, ts(8)))
    // delay 30 min keeps the late view@10:01 inside the allowed lateness
    // (batch-1 watermark = 10:12 − 30 min = 09:42); gap 10 min closes u1/u2
    // once the watermark passes their last event + 10 min
    val out = Streams.funnelWithState(mem.toDF(),
      Seq("view", "click", "purchase"), gapMs = 10 * 60 * 1000, delay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("funnelsmall")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(Ev(7, 1, "view", 0, ts(1)), // the late earlier view
        Ev(8, 3, "view", 0, Timestamp.valueOf("2024-01-01 11:30:00")))
      q.processAllAvailable()
      // watermark = 11:30; u1 horizon closed (12+10min < 11:30), u2 too;
      // u3's view@11:30 keeps its funnel open
      mem.addData(Ev(9, 3, "click", 0, Timestamp.valueOf("2024-01-01 11:31:00")))
      q.processAllAvailable()
      val got = s.sql("SELECT user_id, s1_us, s2_us, s3_us FROM funnelsmall")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      def us(min: Int): Long = ts(min).getTime * 1000L
      assert(got == Seq(
        Seq(1L, us(1), us(2), us(12)), // late view@1 made click@2 the s2
        Seq(2L, us(8), null, null)),
        s"got $got")
    } finally q.stop()
  }

  test("b99: drained streaming funnel equals the batch parity query on events") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-funnel-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.funnelWithState(stream, Seq("view", "click", "purchase"),
      gapMs = 30 * 60 * 1000, delay = "30 minutes")
    val q = out.writeStream.format("memory").queryName("funnelparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT user_id, s1_us, s2_us, s3_us FROM funnelparity")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val oracle = SparkEntry.queries("b99_stream_funnel_parity")(s, sf)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty, "stream emitted nothing — watermark never advanced?")
      assert(streamed == oracle,
        s"stream rows=${streamed.length} != parity query rows=${oracle.length}")
      // no fixture user trips the default 10k buffer cap — all rows unflagged
      val flagged = s.sql("SELECT count(*) FROM funnelparity WHERE dropped_events > 0")
        .collect()(0).getLong(0)
      assert(flagged == 0L, s"$flagged users unexpectedly hit the buffer cap")
    } finally q.stop()
  }

  test("funnelWithState flags a beyond-maxBuffer user via dropped_events") {
    // u1 sends 5 stage events against maxBuffer = 2: 3 events are not
    // buffered and the emitted row must carry dropped_events = 3 (the
    // truncation signal — answers, not just cost, may diverge for this
    // user); u2 stays under the cap and is unflagged
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // batch 1 fills u1's buffer exactly; batch 2's 3 events for u1 all
    // exceed the cap (batch boundaries make the buffered/dropped split
    // deterministic — within-batch group iterator order is not)
    mem.addData(
      Ev(1, 1, "view", 0, ts(1)), Ev(2, 1, "click", 0, ts(2)),
      Ev(6, 2, "view", 0, ts(3)), Ev(7, 2, "click", 0, ts(4)))
    val out = Streams.funnelWithState(mem.toDF(),
      Seq("view", "click", "purchase"), gapMs = 10 * 60 * 1000,
      delay = "0 minutes", maxBuffer = 2)
    val q = out.writeStream.format("memory").queryName("funneltrunc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch-2 timestamps sit ABOVE the batch-1 watermark (10:04, delay
      // 0) — otherwise Spark's late-data filter drops them before the
      // operator and they'd never count as cap-dropped
      mem.addData(Ev(3, 1, "view", 0, ts(6)), Ev(4, 1, "click", 0, ts(7)),
        Ev(5, 1, "purchase", 0, ts(8)))
      q.processAllAvailable()
      mem.addData(Ev(8, 3, "view", 0, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = s.sql(
          "SELECT user_id, s1_us, s2_us, s3_us, dropped_events FROM funneltrunc")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      def us(min: Int): Long = ts(min).getTime * 1000L
      // u1 buffered only view@1, click@2 — s3 lost to the cap, flagged
      assert(got == Seq(
        Seq(1L, us(1), us(2), null, 3L),
        Seq(2L, us(3), us(4), null, 0L)), s"got $got")
    } finally q.stop()
  }

  test("streaming A/B funnel readout: per-arm parity with the batch kernel incl. late revision") {
    // b121's streaming counterpart (r12 VERDICT #4): per-arm stage
    // conversion maintained on the live stream. Users/arms reuse the
    // FloorDivSpec md5-split fixture (ctrl = 1,2,5; trt = 3,4,7; 11 stays
    // open as the watermark mover). u4 is the late-arrival REVISION case:
    // its click@10:02 arrives before its view@10:01 (delivered one batch
    // later, inside the allowed lateness) — buffer-until-close must
    // revise s1 and qualify the click, so trt's u2 count includes u4.
    val s = spark; import s.implicits._
    val stages = Seq("view", "click", "signup", "purchase")
    // the downstream aggregate is GLOBAL (no event-time column), so the
    // late-row risk Spark's static checker guards against cannot occur —
    // see the streamFunnelAbConversion scaladoc; withCheckerDisabled hands
    // the body a conf-isolated clone carrying the disabled flag, and the
    // stream must be BUILT on that clone (Spark reads the flag from the
    // DataFrame's session at start), so `s` keeps the checker throughout.
    // The memory sink registers in the clone's catalog → reads go via cs.
    val (q, mem, cs) = Streams.withCheckerDisabled(s) { cs =>
      implicit val sqlCtx = cs.sqlContext
      val mem = MemoryStream[Ev]
      mem.addData(
        Ev(1, 1, "view", 0, ts(1)), Ev(2, 1, "click", 0, ts(2)),
        Ev(3, 1, "signup", 0, ts(3)), Ev(4, 1, "purchase", 0, ts(4)),
        Ev(5, 2, "view", 0, ts(1)), Ev(6, 2, "click", 0, ts(3)),
        Ev(7, 5, "view", 0, ts(2)),
        Ev(8, 3, "view", 0, ts(1)), Ev(9, 3, "click", 0, ts(2)),
        Ev(10, 3, "signup", 0, ts(4)), Ev(11, 3, "purchase", 0, ts(5)),
        Ev(12, 4, "click", 0, ts(2)), // u4: click first...
        Ev(13, 7, "view", 0, ts(3)))
      val out = Streams.streamFunnelAbConversion(mem.toDF(), stages,
        gapMs = 10 * 60 * 1000, delay = "30 minutes")
      (out.writeStream.format("memory").queryName("funnelab")
        .outputMode("complete").start(), mem, cs)
    }
    try {
      q.processAllAvailable()
      // ...the earlier view arrives late but inside lateness (wm = 09:35),
      // plus the watermark mover (u11 view@12:00 closes everyone else's
      // horizon; its own funnel stays open and never enters the counts)
      mem.addData(Ev(14, 4, "view", 0, ts(1)),
        Ev(15, 11, "view", 0, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      mem.addData(Ev(16, 11, "click", 0, Timestamp.valueOf("2024-01-01 12:01:00")))
      q.processAllAvailable()
      val streamed = cs.sql(
          "SELECT arm, u1, u2, u3, u4, dropped_events FROM funnelab")
        .orderBy("arm").collect().map(_.toSeq).toSeq
      // hand expectation: both arms 3 starters, 2 clickers (u4 ONLY via
      // the late revision), 1 signup, 1 purchase, nothing truncated
      assert(streamed == Seq(Seq(0L, 3L, 2L, 1L, 1L, 0L),
        Seq(1L, 3L, 2L, 1L, 1L, 0L)), s"got $streamed")
      // batch-kernel parity (the b99 discipline): same events, batch stage
      // kernel + horizon cut + the same md5 arm split must reproduce the
      // per-arm counts exactly
      val ev = Seq(
        (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "signup", ts(3)),
        (1L, "purchase", ts(4)), (2L, "view", ts(1)), (2L, "click", ts(3)),
        (5L, "view", ts(2)), (3L, "view", ts(1)), (3L, "click", ts(2)),
        (3L, "signup", ts(4)), (3L, "purchase", ts(5)), (4L, "click", ts(2)),
        (4L, "view", ts(1)), (7L, "view", ts(3)),
        (11L, "view", Timestamp.valueOf("2024-01-01 12:00:00")),
        (11L, "click", Timestamp.valueOf("2024-01-01 12:01:00")))
        .toDF("user_id", "event_type", "ts")
      val wm = broadcast(ev.agg(
        (unix_millis(max(col("ts"))) - lit(1800000L)).as("wm_ms")))
      val horizon = ev.groupBy(col("user_id"))
        .agg(unix_millis(max(col("ts"))).as("last_ms"))
      val batch = graft.operators.Series
        .funnelStageTimes(ev, "user_id", "event_type", "ts", stages)
        .join(horizon, Seq("user_id"))
        .crossJoin(wm)
        .where(col("last_ms") + lit(600000L) < col("wm_ms"))
        .withColumn("arm", pmod(
          graft.functions.Text.tokenHash(col("user_id").cast("string")), lit(2L)))
        .groupBy(col("arm"))
        .agg(count(col("s1")).as("u1"), count(col("s2")).as("u2"),
          count(col("s3")).as("u3"), count(col("s4")).as("u4"))
        .orderBy("arm").collect().map(_.toSeq).toSeq
      assert(batch == streamed.map(_.init),
        s"batch=$batch != streamed-sans-dropped=${streamed.map(_.init)}")
    } finally q.stop()
  }

  test("streaming A/B revenue readout: attribution window edges and late revision") {
    // b126's state machine on a hand-built stream (ctrl = 1,2,5; trt =
    // 3,4,7 — the md5-split fixture; u11 is the watermark mover and stays
    // open). Edge cases the fixture pins down: a purchase AFTER the
    // attribution window (u1's purchase@8 vs window (10:02, 10:07]) and a
    // purchase BEFORE the anchor click (u3's purchase@1) both contribute
    // ZERO attributed cents; the half-cent rounding is floor(v*100 + 0.5)
    // (u1's 10.005 -> 1001); u4's late-arriving earlier view revises s1
    // inside the buffer and makes u4 a starter. gap 10 min, attribution
    // window 5 min (<= gap, the honesty bound).
    val s = spark; import s.implicits._
    val stages = Seq("view", "click", "signup", "purchase")
    val (q, mem, cs) = Streams.withCheckerDisabled(s) { cs =>
      implicit val sqlCtx = cs.sqlContext
      val mem = MemoryStream[Ev]
      mem.addData(
        Ev(1, 1, "view", 0, ts(1)), Ev(2, 1, "click", 0, ts(2)),
        Ev(3, 1, "signup", 0, ts(3)), Ev(4, 1, "purchase", 10.005, ts(4)),
        Ev(5, 1, "purchase", 5.0, ts(8)), // outside (10:02, 10:07] — 0 attr
        Ev(6, 2, "view", 0, ts(1)), Ev(7, 2, "click", 0, ts(3)),
        Ev(8, 5, "view", 0, ts(2)),
        Ev(9, 3, "view", 0, ts(1)), Ev(10, 3, "purchase", 3.0, ts(1)), // pre-anchor
        Ev(11, 3, "click", 0, ts(2)), Ev(12, 3, "signup", 0, ts(4)),
        Ev(13, 3, "purchase", 20.0, ts(5)),
        Ev(14, 4, "click", 0, ts(2)), // u4: click first...
        Ev(15, 7, "view", 0, ts(3)))
      val out = Streams.streamFunnelAbRevenue(mem.toDF(), stages,
        gapMs = 10 * 60 * 1000, delay = "30 minutes",
        attrWindowMs = 5 * 60 * 1000)
      (out.writeStream.format("memory").queryName("funnelabrev")
        .outputMode("complete").start(), mem, cs)
    }
    try {
      q.processAllAvailable()
      // ...u4's earlier view arrives late but inside lateness; u11 moves
      // the watermark past everyone else's horizon and stays open
      mem.addData(Ev(16, 4, "view", 0, ts(1)),
        Ev(17, 11, "view", 0, Timestamp.valueOf("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = cs.sql(
          """SELECT ctrl_users, trt_users, ctrl_purchasers, trt_purchasers,
            |ctrl_rev_c, trt_rev_c, ctrl_rev_per_user_uc, trt_rev_per_user_uc,
            |rev_lift_bp, dropped_events FROM funnelabrev""".stripMargin)
        .collect().map(_.toSeq).toSeq
      // ctrl: u1/u2/u5 start, u1 purchases 1001c attributed; trt: u3/u4/u7
      // start (u4 only via revision), u3 purchases 2000c attributed.
      // lift = (2000*3*10000) div (1001*3) = 19980 (floored)
      assert(got == Seq(Seq(3L, 3L, 1L, 1L, 1001L, 2000L,
        3336666L, 6666666L, 19980L, 0L)), s"got $got")
    } finally q.stop()
  }

  test("b126: drained streaming A/B revenue readout equals the batch parity query") {
    // the graduation contract (r14 VERDICT #4): the live stream over the
    // real sf0.001 events — funnel state machine with in-state revenue
    // attribution, per-arm global pivot — must equal the oracle-gated
    // b126 batch key column-for-column (12 h horizon = 12 h attribution
    // window, 30 min delay; at this sf control's closed revenue is zero,
    // so the -1 lift sentinel path is exercised live).
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-funnel-rev-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val (q, cs) = Streams.withCheckerDisabled(s) { cs =>
      val stream = graft.sources.Tables.normalizeEventsTs(
        cs.readStream.schema(schema).parquet(dir.toString))
      val out = Streams.streamFunnelAbRevenue(stream,
        Seq("view", "click", "signup", "purchase"),
        gapMs = 43200000L, delay = "30 minutes", attrWindowMs = 43200000L)
      (out.writeStream.format("memory").queryName("funnelrevparity")
        .outputMode("complete").start(), cs)
    }
    try {
      q.processAllAvailable()
      val streamed = cs.sql(
          """SELECT ctrl_users, trt_users, ctrl_purchasers, trt_purchasers,
            |ctrl_rev_c, trt_rev_c, ctrl_rev_per_user_uc, trt_rev_per_user_uc,
            |rev_lift_bp FROM funnelrevparity""".stripMargin)
        .collect().map(_.toSeq).toSeq
      val batch = SparkEntry.queries("b126_stream_funnel_ab_revenue")(s, sf)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed != batch=$batch")
      val dropped = cs.sql("SELECT dropped_events FROM funnelrevparity")
        .collect()(0).getLong(0)
      assert(dropped == 0L, s"$dropped events unexpectedly hit the buffer cap")
    } finally q.stop()
  }

  test("classifier inference on a stream equals the batch scored frame") {
    // the unified-API claim behind the c109 family: the SAME
    // Pipeline.linearClassifierScore runs unchanged on a readStream —
    // the weight lookup is a stream-static broadcast join (stateless),
    // the per-doc aggregate is the only stateful op (one in-flight row
    // per doc; complete mode here), so "score on ingest" is the literal
    // same code path as the batch materialized view.
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-cls-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("documents.parquet"), java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val schema = s.read.parquet(s"$sf/documents.parquet").schema
    val stream = s.readStream.schema(schema).parquet(dir.toString)
    val out = graft.operators.Pipeline.linearClassifierScore(
      stream, "doc_id", "text",
      graft.operators.Pipeline.demoClassifierWeights(s, 65536), 65536)
    val q = out.writeStream.format("memory").queryName("clsstream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT id, n_feats, score, kept FROM clsstream")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val batch = SparkEntry.queries("c109_quality_classifier")(s, sf)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=${streamed.length} rows != batch=${batch.length}")
    } finally q.stop()
  }

  test("streaming per-source gate monitor equals the batch b122 query") {
    // the b122 graduation contract (r13 VERDICT #1): the live ingest
    // monitor — score the document stream, stream-static join the slim
    // (doc_id, source, n_chars) dims, keep per-source gate counts — must
    // equal the batch query the driver oracles. The dims join is
    // stateless; the per-source aggregate holds O(|sources|) state at any
    // corpus size (complete mode reads it back).
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-cls-gate-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("documents.parquet"), java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val schema = s.read.parquet(s"$sf/documents.parquet").schema
    // emit-once scorer + ONE stateful aggregate (per-source counts): the
    // static checker flags the aggregate-downstream-of-fMGWS pattern, but
    // NO event-time column exists anywhere in this query (no watermark, no
    // late discard is possible) — the streamFunnelAbConversion case, so
    // the same scoped escape hatch: the whole stream is built on the
    // wrapper's conf-isolated clone (the flag is read from the
    // DataFrame's session at start; s keeps the checker) and the memory
    // sink lands in the clone's catalog. Parity below proves the drained
    // result is exact; the multi-trigger case below proves no
    // double-counting under a split trigger schedule (the r16 roadmap
    // migration off the chained-aggregate shape).
    val (q, cs) = Streams.withCheckerDisabled(s) { cs =>
      val stream = cs.readStream.schema(schema).parquet(dir.toString)
      val dims = cs.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val out = Streams.streamClassifierGateMonitor(stream, dims,
        graft.operators.Pipeline.demoClassifierWeights(cs, 65536), 65536)
      (out.writeStream.format("memory").queryName("clsgate")
        .outputMode("complete").start(), cs)
    }
    try {
      q.processAllAvailable()
      val streamed = cs.sql(
          "SELECT source, total_docs, kept_docs, kept_chars, kept_ppm FROM clsgate")
        .orderBy("source").collect().map(_.toSeq).toSeq
      val batch = SparkEntry.queries("b122_stream_classifier_parity")(s, sf)
        .collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed != batch=$batch")
    } finally q.stop()
  }

  test("gate monitor across MULTIPLE triggers: per-source totals are not double-counted") {
    // the same replay question the b127 multi-trigger case answers, on the
    // b122 shape (r16 roadmap item 4): before the emit-once migration the
    // inline chained-aggregate stream double-counted trigger-1 docs when a
    // second trigger fired (the 5-of-3 defect). Feed two triggers (docs
    // 1,2 then doc 3) through TWO sources and assert each doc counts once.
    val s = spark; import s.implicits._
    val (q, mem, cs) = Streams.withCheckerDisabled(s) { cs =>
      implicit val sqlCtx = cs.sqlContext
      val mem = MemoryStream[(Long, String)]
      mem.addData((1L, "the quick brown fox jumps"), (2L, "lazy dogs sleep all day"))
      val dims = Seq((1L, "web", 25L), (2L, "web", 23L), (3L, "pdf", 30L))
        .toDF("doc_id", "source", "n_chars")
      val out = Streams.streamClassifierGateMonitor(
        mem.toDF().toDF("doc_id", "text"), dims,
        graft.operators.Pipeline.demoClassifierWeights(cs, 65536), 65536)
      (out.writeStream.format("memory").queryName("gatemulti")
        .outputMode("complete").start(), mem, cs)
    }
    try {
      q.processAllAvailable()
      val t1 = cs.sql("SELECT sum(total_docs) FROM gatemulti").collect()(0).getLong(0)
      assert(t1 == 2L, s"trigger 1 must cover docs 1-2 once, got $t1")
      mem.addData((3L, "a third document arrives later"))
      q.processAllAvailable()
      val t2 = cs.sql("SELECT sum(total_docs) FROM gatemulti").collect()(0).getLong(0)
      assert(t2 == 3L, s"trigger 2 must cover docs 1-3 exactly once, got $t2")
      val bySrc = cs.sql("SELECT source, total_docs FROM gatemulti ORDER BY source")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(bySrc == Seq(("pdf", 1L), ("web", 2L)), s"per-source split wrong: $bySrc")
    } finally q.stop()
  }

  test("b127: streaming calibration drift monitor equals the batch parity query") {
    // the b122 graduation pattern on the calibration family: score the
    // live document stream, bucket into the REFERENCE (prev-generation)
    // calibration table's score ranges via the broadcast 10-row frame,
    // keep per-decile live keep rates + drift verdicts — the drained
    // stream must equal the b127 batch key on every column it emits
    // (drifted_total is batch-only by design: a window over a streaming
    // aggregate is unsupported; the consumer sums the 10-row column).
    // Same chained-stateful-aggregate shape as b122 (no event-time column
    // anywhere), so the same scoped checker escape hatch.
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-cal-monitor-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("documents.parquet"), java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val schema = s.read.parquet(s"$sf/documents.parquet").schema
    val (q, cs) = Streams.withCheckerDisabled(s) { cs =>
      val stream = cs.readStream.schema(schema).parquet(dir.toString)
      val ref = EntryShared.calibrationTableOf(
        EntryShared.docGateBits(cs, sf).where(pmod(col("doc_id"), lit(10)) =!= 3))
      val out = Streams.streamCalibrationMonitor(stream, ref,
        graft.operators.Pipeline.demoClassifierWeights(cs, 65536), 65536,
        keptNano = 395000000L, driftPpm = 10000L)
      (out.writeStream.format("memory").queryName("calmonitor")
        .outputMode("complete").start(), cs)
    }
    try {
      q.processAllAvailable()
      val streamed = cs.sql(
          """SELECT decile, ref_kept_ppm, n_docs_live, kept_h_docs_live,
            |kept_h_ppm_live, ppm_delta, drifted FROM calmonitor""".stripMargin)
        .orderBy("decile").collect().map(_.toSeq).toSeq
      val batch = SparkEntry.queries("b127_stream_calibration_monitor")(s, sf)
        .drop("drifted_total").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream=$streamed != batch=$batch")
    } finally q.stop()
  }

  test("b127 monitor across MULTIPLE triggers: per-doc totals are not double-counted") {
    // the chained-stateful-aggregate replay question (r15 review): in
    // complete mode the upstream per-doc aggregate re-emits its ENTIRE
    // state every trigger — if the downstream decile aggregate MERGED
    // that re-emission additively, trigger-1 docs would count again in
    // trigger 2 and the monitor would be wrong as a live query. This
    // test feeds two triggers (docs 1,2 then doc 3) and asserts the
    // decile counts cover each doc exactly once.
    val s = spark; import s.implicits._
    val ref = Seq((1L, -1000000L, 500000L), (2L, 0L, 500000L))
      .toDF("decile", "lo_score", "kept_h_ppm")
    val (q, mem, cs) = Streams.withCheckerDisabled(s) { cs =>
      implicit val sqlCtx = cs.sqlContext
      val mem = MemoryStream[(Long, String)]
      mem.addData((1L, "the quick brown fox jumps"), (2L, "lazy dogs sleep all day"))
      val out = Streams.streamCalibrationMonitor(
        mem.toDF().toDF("doc_id", "text"), ref,
        graft.operators.Pipeline.demoClassifierWeights(cs, 65536), 65536,
        keptNano = 395000000L, driftPpm = 10000L)
      (out.writeStream.format("memory").queryName("calmulti")
        .outputMode("complete").start(), mem, cs)
    }
    try {
      q.processAllAvailable()
      val t1 = cs.sql("SELECT sum(n_docs_live) FROM calmulti").collect()(0).getLong(0)
      assert(t1 == 2L, s"trigger 1 must cover docs 1-2 once, got $t1")
      mem.addData((3L, "a third document arrives later"))
      q.processAllAvailable()
      val t2 = cs.sql("SELECT sum(n_docs_live) FROM calmulti").collect()(0).getLong(0)
      assert(t2 == 3L, s"trigger 2 must cover docs 1-3 exactly once, got $t2")
    } finally q.stop()
  }

  test("funnelStagesWithState N=2 and N=4 parity with the batch stage kernel") {
    // the N-stage machine against Series.funnelStageTimes + the b99
    // horizon cut, on the real events fixture, at two widths
    val s = spark
    val sf = "/root/testdata/sf0.001"
    for (stages <- Seq(Seq("view", "purchase"),
                       Seq("view", "click", "signup", "purchase"))) {
      val n = stages.size
      val dir = tempDir(s"graft-funnel-n$n")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
      val schema = s.read.parquet(s"$sf/events.parquet").schema
      val stream = graft.sources.Tables.normalizeEventsTs(
        s.readStream.schema(schema).parquet(dir.toString))
      val out = Streams.funnelStagesWithState(stream, stages,
        gapMs = 30 * 60 * 1000, delay = "30 minutes")
      val name = s"funneln$n"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val cols = (0 until n).map(i => s"stage_us[$i]").mkString(", ")
        val streamed = s.sql(
            s"SELECT user_id, $cols FROM $name WHERE dropped_events = 0")
          .orderBy("user_id").collect().map(_.toSeq).toSeq
        val ev = graft.sources.Tables.t(s, sf, "events")
        val f = ev.where(col("event_type").isin(stages: _*))
        val wm = broadcast(ev.agg(
          (unix_millis(max(col("ts"))) - lit(1800000L)).as("wm_ms")))
        val horizon = f.groupBy(col("user_id"))
          .agg(unix_millis(max(col("ts"))).as("last_ms"))
        val batch = graft.operators.Series
          .funnelStageTimes(f, "user_id", "event_type", "ts", stages)
          .join(horizon, Seq("user_id"))
          .crossJoin(wm)
          .where(col("last_ms") + lit(1800000L) < col("wm_ms"))
          .select(col("user_id") +:
            (1 to n).map(i => unix_micros(col(s"s$i")).as(s"s${i}_us")): _*)
          .orderBy("user_id").collect().map(_.toSeq).toSeq
        assert(streamed.nonEmpty, s"N=$n stream emitted nothing")
        assert(streamed == batch,
          s"N=$n parity: stream=${streamed.length} rows, batch=${batch.length}")
      } finally q.stop()
    }
  }

  test("c98: sliding-window stream CMS grids equal the batch aggregation cell-for-cell") {
    // counting-monoid cells inside each window + deterministic sliding
    // assignment: closed windows must match batch exactly, per cell
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-cms-slide-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamSlidingCmsCells(stream, "1 hour", "30 minutes", "30 minutes")
    val q = out.writeStream.format("memory").queryName("cmsslideparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
          "SELECT window_start, r, bucket, cnt FROM cmsslideparity")
        .orderBy("window_start", "r", "bucket").collect().map(_.toSeq).toSeq
      val ev = graft.sources.Tables.t(s, sf, "events")
      val wmRow = ev.agg(org.apache.spark.sql.functions.max(col("ts"))).head().getTimestamp(0)
      val wm = new java.sql.Timestamp(wmRow.getTime - 30 * 60 * 1000)
      val batch = ev.select(
          org.apache.spark.sql.functions.window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("user_id").cast("string").as("tok"))
        .select(col("w"), col("tok"),
          explode(org.apache.spark.sql.functions.sequence(lit(0), lit(3))).as("r"))
        .groupBy(col("w"), col("r"),
          graft.functions.CountMin.bucketOf(col("r"), col("tok"), 64).as("bucket"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
        .where(col("w.end") <= lit(wm))
        .select(col("w.start").as("window_start"), col("r"), col("bucket"), col("cnt"))
        .orderBy("window_start", "r", "bucket").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty, "stream emitted nothing — watermark never advanced?")
      assert(streamed == batch,
        s"stream cells=${streamed.length} != batch cells=${batch.length}")
    } finally q.stop()
  }

  test("c99: sliding-window stream MG summaries satisfy the audit vs exact per-window counts") {
    // MG raw estimates are merge-order-dependent; what the mergeable-
    // summaries theorem guarantees per closed window — capture of every
    // heavy key, error <= n/(k+1), <= k entries — must hold for the
    // DRAINED stream's summaries against exact batch counts
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-mg-slide-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamSlidingHeavyHitters(stream, "1 hour", "30 minutes", "30 minutes", k = 2)
    val q = out.writeStream.format("memory").queryName("mgslideparity")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql(
          "SELECT window_start, e.tok AS tok, e.est AS est " +
            "FROM mgslideparity LATERAL VIEW explode(mg.entries) AS e")
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed.nonEmpty, "stream emitted nothing — watermark never advanced?")
      val ev = graft.sources.Tables.t(s, sf, "events")
      val exact = ev.select(
          org.apache.spark.sql.functions.window(col("ts"), "1 hour", "30 minutes").as("w"),
          coalesce(col("event_type"), lit("")).as("tok"))
        .groupBy(col("w.start").as("ws"), col("tok"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val nPerW = exact.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
      // only windows the stream closed (watermark) are checkable
      val closed = streamed.keySet.map(_._1)
      closed.foreach { w =>
        val n = nPerW(w)
        exact.filter(_._1._1 == w).foreach { case ((_, tok), cnt) =>
          val est = streamed.getOrElse((w, tok), 0L)
          if (cnt * 3 > n) assert(est > 0, s"heavy $tok not captured in window $w")
          assert(est <= cnt && (cnt - est) * 3 <= n,
            s"estimate $est outside [cnt - n/3, cnt] for $tok in $w (cnt=$cnt n=$n)")
        }
      }
    } finally q.stop()
  }

  test("c78: stream-maintained count-min cells equal the batch sketch cell-for-cell") {
    // CMS cell addition commutes, so a complete-mode streaming
    // aggregation of the cell expansion must land on the exact batch
    // grid regardless of micro-batch boundaries
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-cms-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(s"$sf/events.parquet"))
    val schema = s.read.parquet(s"$sf/events.parquet").schema
    val stream = graft.sources.Tables.normalizeEventsTs(
      s.readStream.schema(schema).parquet(dir.toString))
    val out = Streams.streamCountMinCells(stream, "user_id", d = 4, width = 64)
    val q = out.writeStream.format("memory").queryName("cmsparity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = s.sql("SELECT r, bucket, cnt FROM cmsparity")
        .orderBy("r", "bucket").collect().map(_.toSeq).toSeq
      val batch = graft.functions.CountMin.build(
          graft.sources.Tables.t(s, sf, "events")
            .select(col("user_id").cast("string").as("tok")), "tok", 4, 64)
        .orderBy("r", "bucket").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"stream cells=${streamed.length} != batch cells=${batch.length}")
    } finally q.stop()
  }

  test("stream-maintained Misra-Gries summary satisfies the audit vs batch exact counts") {
    // micro-batch boundaries are extra merge() points; the mergeable-
    // summaries guarantee must survive them: every heavy lang captured,
    // error <= n/(k+1), <= k entries (raw estimates MAY differ from a
    // batch run — only the audit is deterministic)
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val dir = tempDir("graft-mg-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("documents.parquet"), java.nio.file.Paths.get(s"$sf/documents.parquet"))
    val schema = s.read.parquet(s"$sf/documents.parquet").schema
    val stream = s.readStream.schema(schema).parquet(dir.toString)
    val k = 2
    val out = Streams.streamHeavyHitterSummary(stream, "lang", k)
    val q = out.writeStream.format("memory").queryName("mgstream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val sm = s.sql("SELECT mg.entries FROM mgstream")
        .first().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = s.read.parquet(s"$sf/documents.parquet")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = exact.values.sum
      assert(sm.nonEmpty && sm.size <= k)
      exact.foreach { case (lang, f) =>
        val est = sm.getOrElse(lang, 0L)
        assert(est <= f && (f - est) * (k + 1) <= n,
          s"stream MG bound violated for $lang: est=$est f=$f n=$n")
        if (f * (k + 1) > n) assert(est > 0, s"stream MG dropped heavy $lang")
      }
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits closed sessions with counts") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    // user 1: events at 10:01, 10:02 (session A), then 11:00 (new session B)
    // user 2: single event at 10:05, then 11:30 (closes user 2's session A)
    mem.addData(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 1.0, ts(2)),
      Ev(3, 2, "view", 2.0, ts(5)))
    val out = Streams.sessionizeWithState(mem.toDF(), gapMs = 30 * 60 * 1000, delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("statesess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(
        Ev(4, 1, "click", 1.0, Timestamp.valueOf("2024-01-01 11:00:00")),
        Ev(5, 2, "view", 1.0, Timestamp.valueOf("2024-01-01 11:30:00")))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, session_start, session_end, n FROM statesess ORDER BY user_id, session_start")
        .collect()
      // user 1 session A closed by the 11:00 event (gap >= 30 min)
      val u1 = rows.filter(_.getLong(0) == 1L)
      assert(u1.length == 1)
      assert(u1(0).getTimestamp(1) == ts(1) && u1(0).getLong(3) == 2L)
      // user 2 session A closed by the 11:30 event
      val u2 = rows.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2(0).getLong(3) == 1L)
    } finally q.stop()
  }

  test("sessionization compares gaps in MICROSECONDS, matching the batch twin") {
    // two events 1,799,999,501 µs apart with gap = 30 min: session_window
    // (µs-exact) merges them; a ms-truncated comparison (getTime) would
    // see exactly 1,800,000 ms and split — the r16 precision fix
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "click", 1.0, Timestamp.valueOf("2024-01-01 10:00:00.000999")),
      Ev(2, 1, "click", 1.0, Timestamp.valueOf("2024-01-01 10:30:00.0005")))
    val out = Streams.sessionizeWithState(mem.toDF(), gapMs = 30 * 60 * 1000,
      delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessus")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a far-future event closes the (merged) session
      mem.addData(Ev(3, 1, "click", 1.0, Timestamp.valueOf("2024-01-01 23:00:00")))
      q.processAllAvailable()
      val rows = s.sql("SELECT n FROM sessus").collect().map(_.getLong(0))
      assert(rows.toSeq == Seq(2L),
        s"boundary pair must merge into ONE 2-event session, got $rows")
    } finally q.stop()
  }

  test("streaming near-dup: a re-delivered doc is stored once, never inflating the bucket") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again " +
        "every single day without fail in the morning"
      val mem = MemoryStream[(Long, String)]
      val out = Streams.streamNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.7)
        .toDF("doc_id", "dup_of", "est")
      val q = out.writeStream.format("memory").queryName("redelivery")
        .outputMode("append").start()
      try {
        // at-least-once source: doc 1 delivered in THREE micro-batches
        (1 to 3).foreach { _ => mem.addData((1L, base)); q.processAllAvailable() }
        mem.addData((3L, base)) // exact dup: all 16 bands agree
        q.processAllAvailable()
        val raw = s.sql(
          "SELECT count(*) FROM redelivery WHERE doc_id = 3 AND dup_of = 1")
          .head().getLong(0)
        // one stored copy -> one emission per agreeing band (16); the
        // pre-fix duplicate appends would have emitted 48
        assert(raw == 16L, s"expected 16 per-band emissions, got $raw")
        assert(s.sql("SELECT count(*) FROM redelivery WHERE doc_id = dup_of")
          .head().getLong(0) == 0L, "a re-delivery must never match itself")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming bloom drop KEEPS null-keyed rows — no membership evidence, never dropped") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evalKeys = (1L to 50L).map(i => i * 0x9e3779b97f4a7c15L)
    val bits = evalKeys.toDF("h")
      .agg(graft.functions.Bloom.build(col("h"), mBits = 1 << 16, k = 5))
      .head.getSeq[Long](0).toArray
    val mem = MemoryStream[(Long, String)]
    // key column derived as a nullable expression: tag "x" -> null key
    mem.addData((evalKeys.head, "k"), (999999L, "k"), (0L, "x"))
    val in = mem.toDF().toDF("h0", "tag")
      .select(when(col("tag") === "k", col("h0")).as("h"), col("tag"))
    val out = Streams.streamBloomDrop(in, col("h"), bits, k = 5)
    val q = out.writeStream.format("memory").queryName("bloomnull")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = s.sql("SELECT h, tag FROM bloomnull").collect()
      assert(kept.exists(_.isNullAt(0)), "null-keyed row must be KEPT")
      assert(kept.exists(r => !r.isNullAt(0) && r.getLong(0) == 999999L))
      assert(!kept.exists(r => !r.isNullAt(0) && r.getLong(0) == evalKeys.head),
        "contaminated row must still drop")
    } finally q.stop()
  }

  test("stream-stream interval join emits in-window pairs and evicts state past the watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val out = Streams.streamIntervalJoin(imps.toDF(), clks.toDF(), "user_id",
        "imp_ts", "click_ts", window = "30 minutes", delay = "10 minutes")
      .select(col("imp_id"), col("click_id"))
    val q = out.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      // user 1: click 10 min after the impression -> in window;
      // user 2: click 45 min after -> outside; user 3: click, no impression
      imps.addData(Imp(10, 1, ts(0)), Imp(11, 2, ts(0)))
      clks.addData(Clk(20, 1, ts(10)), Clk(21, 2, ts(45)), Clk(22, 3, ts(5)))
      q.processAllAvailable()
      val rows = s.sql("SELECT imp_id, click_id FROM ssjoin ORDER BY imp_id, click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((10L, 20L)))
      // Advance BOTH watermarks far past the buffered rows (watermark =
      // min over sources of max event - delay), then run one more batch:
      // eviction uses the watermark fixed at the END of the prior batch.
      val far = Timestamp.valueOf("2024-01-01 13:00:00")
      imps.addData(Imp(12, 9, far)); clks.addData(Clk(23, 9, far))
      q.processAllAvailable()
      imps.addData(Imp(13, 8, far)); clks.addData(Clk(24, 8, far))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty, "expected a stateful join operator in the progress")
      // all 10:xx-era rows (5 of them) must be gone; only the recent rows
      // (2 imps + 2 clicks at 13:00) may remain buffered
      val total = st.map(_.numRowsTotal).sum
      assert(total <= 4, s"join state not evicted past the watermark: $total rows")
      val removed = q.recentProgress.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
      assert(removed >= 5, s"expected the early rows evicted, removed=$removed")
      // the same-timestamp pairs joined (click_ts in [imp_ts, imp_ts+30m))
      val all = s.sql("SELECT imp_id, click_id FROM ssjoin ORDER BY imp_id, click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(all == Seq((10L, 20L), (12L, 23L), (13L, 24L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows only after the watermark proves no match") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val out = Streams.streamIntervalJoin(imps.toDF(), clks.toDF(), "user_id",
        "imp_ts", "click_ts", window = "30 minutes", delay = "10 minutes",
        joinType = "left_outer")
      .select(col("imp_id"), col("click_id"))
    val q = out.writeStream.format("memory").queryName("ssleft")
      .outputMode("append").start()
    try {
      // user 1 clicks in-window; user 2's click is 45 min late (no match)
      imps.addData(Imp(10, 1, ts(0)), Imp(11, 2, ts(0)))
      clks.addData(Clk(20, 1, ts(10)), Clk(21, 2, ts(45)))
      q.processAllAvailable()
      def rows() = s.sql("SELECT imp_id, click_id FROM ssleft ORDER BY imp_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      // the unmatched imp 11 must NOT be emitted yet: the watermark has not
      // passed imp_ts + 30m, so a matching click could still arrive
      assert(rows() == Seq((10L, 20L)), s"premature outer emission: ${rows()}")
      // push the watermark far past imp_ts + window on both sources
      val far = Timestamp.valueOf("2024-01-01 13:00:00")
      imps.addData(Imp(12, 9, far)); clks.addData(Clk(23, 9, far))
      q.processAllAvailable()
      imps.addData(Imp(13, 8, far)); clks.addData(Clk(24, 8, far))
      q.processAllAvailable()
      assert(rows().contains((11L, -1L)),
        s"unmatched impression never emitted with null click: ${rows()}")
    } finally q.stop()
  }

  test("full-outer interval join emits both sides' unmatched rows past the watermark") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val imps = MemoryStream[Imp]
    val clks = MemoryStream[Clk]
    val out = Streams.streamIntervalJoin(imps.toDF(), clks.toDF(), "user_id",
        "imp_ts", "click_ts", window = "30 minutes", delay = "10 minutes",
        joinType = "full_outer")
      .select(col("imp_id"), col("click_id"))
    val q = out.writeStream.format("memory").queryName("ssfull")
      .outputMode("append").start()
    try {
      // user 1 matches; user 2's imp never gets a click; user 3 clicks
      // with no impression at all
      imps.addData(Imp(10, 1, ts(0)), Imp(11, 2, ts(0)))
      clks.addData(Clk(20, 1, ts(10)), Clk(22, 3, ts(5)))
      q.processAllAvailable()
      val far = Timestamp.valueOf("2024-01-01 13:00:00")
      imps.addData(Imp(12, 9, far)); clks.addData(Clk(23, 9, far))
      q.processAllAvailable()
      imps.addData(Imp(13, 8, far)); clks.addData(Clk(24, 8, far))
      q.processAllAvailable()
      val rows = s.sql("SELECT imp_id, click_id FROM ssfull").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                   if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((10L, 20L)), s"matched pair missing: $rows")
      assert(rows.contains((11L, -1L)), s"left-unmatched imp missing: $rows")
      assert(rows.contains((-1L, 22L)), s"right-unmatched click missing: $rows")
    } finally q.stop()
  }

  test("stream-static join enriches events with dimension attributes") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val mem = MemoryStream[Ev]
    mem.addData(Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 2, "view", 2.0, ts(2)),
      Ev(3, 9, "click", 1.0, ts(3))) // user 9 has no dim row
    val out = mem.toDF().join(broadcast(dim), col("user_id") === col("cust_id"), "left")
      .select(col("event_id"), col("tier"))
    val q = out.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = s.sql("SELECT event_id, tier FROM enriched ORDER BY event_id").collect()
      assert(rows.map(r => Option(r.getString(1))).toSeq ==
        Seq(Some("gold"), Some("silver"), None))
    } finally q.stop()
  }

  test("transformWithState running counts accumulate across micro-batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Ev]
      mem.addData(Ev(1, 1, "click", 0, ts(1)), Ev(2, 1, "click", 0, ts(2)),
        Ev(3, 2, "view", 0, ts(3)))
      val out = Streams.runningCountsWithState(mem.toDF()).toDF("user_id", "n")
      val q = out.writeStream.format("memory").queryName("twstate")
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        mem.addData(Ev(4, 1, "click", 0, ts(10)))
        q.processAllAvailable()
        val last = s.sql(
          "SELECT user_id, max(n) AS n FROM twstate GROUP BY user_id ORDER BY user_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(last.toSeq == Seq((1L, 3L), (2L, 1L))) // state carried across batches
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming near-dup: a later near-duplicate is flagged against the original") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again " +
        "every single day without fail in the morning"
      val mem = MemoryStream[(Long, String)]
      mem.addData((1L, base),
        (2L, "completely unrelated text about distributed query planning on spark"))
      val out = Streams.streamNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5)
        .toDF("doc_id", "dup_of", "est")
      val q = out.writeStream.format("memory").queryName("neardup")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // batch 1: two distinct docs — nothing flagged
        assert(s.sql("SELECT count(*) FROM neardup").head().getLong(0) == 0L)
        mem.addData((3L, base + " extra"))  // near-dup of doc 1, next batch
        q.processAllAvailable()
        val hits = s.sql(
          "SELECT DISTINCT doc_id, dup_of FROM neardup").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(hits == Set((3L, 1L)), s"got $hits")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming near-dup output equals the c37 batch parity query") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again " +
        "every single day without fail in the morning"
      val docs = Seq(
        1L -> base,
        2L -> "completely unrelated text about distributed query planning on spark clusters",
        3L -> (base + " extra"), // near-dup of 1
        4L -> base,              // exact dup of 1 (n_agree = 64)
        5L -> "another unrelated document with entirely different words throughout")
      val mem = MemoryStream[(Long, String)]
      val out = Streams.streamNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.7)
        .toDF("doc_id", "dup_of", "est")
      val q = out.writeStream.format("memory").queryName("sigparity")
        .outputMode("append").start()
      try {
        // one micro-batch per doc in id order: arrival order == id order,
        // which is exactly the assumption c37's batch form encodes
        docs.foreach { case (id, t) => mem.addData((id, t)); q.processAllAvailable() }
        // est = n_agree/64 exactly (64 = 2^6, so the double is exact);
        // one emission per agreeing band -> DISTINCT
        val streamed = s.sql(
          "SELECT DISTINCT doc_id, dup_of, CAST(round(est * 64) AS INT) AS n_agree FROM sigparity")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val batch = graft.operators.Dedup.signatureAgreementPairs(
            graft.operators.Dedup.shingleSets(docs.toDF("doc_id", "text"), "doc_id", "text"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(batch.nonEmpty, "fixture produced no near-dup pairs")
        assert(batch.exists(_._3 == 64), "expected the exact dup at full agreement")
        assert(streamed == batch, s"stream $streamed != batch $batch")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming near-dup drained over the REAL documents table equals the c120 key") {
    // the r16 graduation evidence: the LIVE transformWithState detector,
    // run over /root/testdata/sf0.001 documents (not a toy fixture),
    // produces exactly the rows the driver-gated c120 key declares. All
    // docs arrive in ONE micro-batch, so emit direction follows
    // undefined row order — normalized via least/greatest, which is
    // c120's own declared shape. est compares EXACTLY (n_agree/64 is a
    // dyadic rational on both paths).
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sf = "/root/testdata/sf0.001"
      val docs = s.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect().toSeq
      val mem = MemoryStream[(Long, String)]
      mem.addData(docs: _*)
      val out = Streams.streamNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.7)
        .toDF("doc_id", "dup_of", "est")
      val q = out.writeStream.format("memory").queryName("neardup_live")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = s.sql(
          """SELECT DISTINCT least(doc_id, dup_of) AS a,
            |  greatest(doc_id, dup_of) AS b, est FROM neardup_live""".stripMargin)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val batch = graft.SparkEntry.queries("c120_stream_neardup_live")(s, sf)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(batch.nonEmpty, "fixture corpus produced no near-dup candidates")
        assert(streamed == batch,
          s"live stream != c120 key: extra=${streamed -- batch} missing=${batch -- streamed}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming bloom decontamination drops eval-tainted rows, keeps the rest") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // bitmap built batch-side over the "eval" key universe
    val evalKeys = (1L to 50L).map(i => i * 0x9e3779b97f4a7c15L)
    val bits = evalKeys.toDF("h")
      .agg(graft.functions.Bloom.build(col("h"), mBits = 1 << 16, k = 5))
      .head.getSeq[Long](0).toArray
    val cleanKeys = (1000L to 1020L).map(i => i * 0x9e3779b97f4a7c15L)
    val mem = MemoryStream[Long]
    mem.addData(evalKeys.take(5) ++ cleanKeys: _*)
    val out = Streams.streamBloomDrop(mem.toDF().toDF("h"), col("h"), bits, k = 5)
    val q = out.writeStream.format("memory").queryName("bloomdrop")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val kept = s.sql("SELECT h FROM bloomdrop").collect().map(_.getLong(0)).toSet
      // no false negatives: every eval key is gone
      assert(evalKeys.take(5).forall(k => !kept.contains(k)), "a tainted row passed")
      // these particular clean keys also probe negative (fixed bitmap, so
      // this is deterministic — recheck if m/k or the key sets change)
      assert(kept == cleanKeys.toSet, s"clean rows dropped or extras kept: $kept")
    } finally q.stop()
  }

  test("stream-stream interval join: purchases join clicks within the window") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(Ev(10, 1, "click", 0, ts(1)), Ev(11, 1, "click", 0, ts(30)))
    purchases.addData(Ev(20, 1, "purchase", 9.99, ts(15)))
    val c = clicks.toDF().select(col("event_id").as("click_id"),
      col("user_id").as("cu"), col("ts").as("cts")).withWatermark("cts", "1 hour")
    val p = purchases.toDF().select(col("event_id").as("purchase_id"),
      col("user_id").as("pu"), col("ts").as("pts")).withWatermark("pts", "1 hour")
    // click must precede the purchase by at most 20 minutes
    val joined = p.join(c,
      col("pu") === col("cu") &&
        col("cts") <= col("pts") &&
        col("cts") >= col("pts") - expr("INTERVAL 20 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = s.sql("SELECT purchase_id, click_id FROM ssjoin ORDER BY click_id").collect()
      // click 10 (10:01) is within 20 min of purchase (10:15); click 11 (10:30) is after
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((20L, 10L)))
    } finally q.stop()
  }

  test("sliding windows assign each event to width/slide windows") {
    val s = spark; import s.implicits._
    val batch = Seq(Ev(1, 1, "click", 1.0, ts(10))).toDF()
    val rows = Streams.slidingCounts(batch, "1 hour", "30 minutes")
      .orderBy("window_start").collect()
    // one event at 10:10 belongs to windows starting 09:30 and 10:00
    assert(rows.length == 2)
    assert(rows.map(_.getTimestamp(0).toString).toSeq ==
      Seq("2024-01-01 09:30:00.0", "2024-01-01 10:00:00.0"))
  }

  test("b72: multi-batch stream drained through the IVM merge equals the batch recompute") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val src = tempDir("graft-ivm-src")
    val stateDir = tempDir("graft-ivm-state").toString
    val ckpt = tempDir("graft-ivm-ckpt").toString
    // split the events into 4 files so the merge runs over ≥4 micro-batches
    graft.sources.Tables.t(s, sf, "events").repartition(4)
      .write.mode("overwrite").parquet(src.toString)
    val schema = s.read.parquet(src.toString).schema
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    def state(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("sum_cents"))
    val q = stream.writeStream
      .foreachBatch(Streams.ivmMergeBatch(stateDir, Seq("user_id", "day"),
        Map("n_events" -> "sum", "sum_cents" -> "sum"), state))
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = Streams.ivmState(s, stateDir).get
      .orderBy("user_id", "day").collect().map(_.toSeq).toSeq
    val want = SparkEntry.queries("b72_stream_ivm_parity")(s, sf)
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want,
      s"IVM state (${got.length} rows) != batch recompute (${want.length} rows)")
  }

  test("ivmMergeBatch: a retried micro-batch overwrites, never double-counts") {
    val s = spark; import s.implicits._
    val stateDir = tempDir("graft-ivm-retry").toString
    def state(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val merge = Streams.ivmMergeBatch(stateDir, Seq("k"),
      Map("n" -> "sum", "sv" -> "sum"), state)
    merge(Seq((1L, 10L), (2L, 5L)).toDF("k", "v"), 0L)
    merge(Seq((1L, 7L)).toDF("k", "v"), 1L)
    def snap() = Streams.ivmState(s, stateDir).get.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val after = snap()
    assert(after == Seq((1L, 2L, 17L), (2L, 1L, 5L)), after.toString)
    merge(Seq((1L, 7L)).toDF("k", "v"), 1L) // retry of batch 1
    assert(snap() == after, "retry double-counted the batch")
  }

  test("batch and streaming tumbling windows agree on the same data") {
    val s = spark; import s.implicits._
    val batch = Seq(
      Ev(1, 1, "click", 1.0, ts(1)), Ev(2, 1, "click", 1.0, ts(2)),
      Ev(3, 2, "view", 2.0, ts(16))).toDF()
    val b = Streams.tumblingCounts(batch, "15 minutes")
      .select(col("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type").collect()
    assert(b.length == 2 && b(0).getLong(2) == 2L && b(1).getLong(2) == 1L)
  }
}
