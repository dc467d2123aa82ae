package graft

import java.sql.Timestamp

import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.{Evt, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Event-time semantics of the streaming analytics operators, driven with
  * MemoryStream: windows finalize only when the watermark passes; sessions
  * close on gap or on event-time timeout.
  */
class StreamingAnalyticsSpec extends GraftSparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("watermarked tumbling window emits finalized windows once (append mode)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val counts = StreamingAnalytics.windowedCounts(
      in.toDF().toDF("ts", "event_type"), windowLength = "1 minute",
      watermarkDelay = "10 seconds")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    try {
      // two events in window [0, 60), one in [60, 120)
      in.addData((ts(5), "click"), (ts(20), "click"), (ts(70), "view"))
      q.processAllAvailable()
      // the post-batch no-data batch advances the watermark to 60s and
      // finalizes [0,60) — but [60,120) must still be open: premature
      // emission of an unfinalized window fails here
      val mid = spark.table("win_counts")
        .select("ws", "event_type", "n").as[(Timestamp, String, Long)]
        .collect().toSeq
      assert(mid == Seq((ts(0), "click", 2L)),
        s"expected only the closed [0,60) window, got $mid")
      in.addData((ts(200), "click")) // push watermark past both windows
      q.processAllAvailable()
      in.addData((ts(400), "click"))
      q.processAllAvailable()
      // exact multiset: duplicates from double emission must fail, so no
      // toSet collapse — sorted Seq comparison
      val rows = spark.table("win_counts")
        .select("ws", "event_type", "n").as[(Timestamp, String, Long)]
        .collect().toSeq.sortBy(r => (r._1.getTime, r._2))
      // [180,240) (the ts=200 event) also closed once the watermark hit
      // 390; [360,420) (ts=400) is still open — exactly three rows
      assert(rows == Seq((ts(0), "click", 2L), (ts(60), "view", 1L),
        (ts(180), "click", 1L)), s"got $rows")
    } finally q.stop()
  }

  test("windowed heavy hitters: MG candidates per window cover the hot token") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val hh = StreamingAnalytics.windowedHeavyHitters(
      in.toDF().toDF("ts", "text"), k = 8,
      windowLength = "1 minute", watermarkDelay = "10 seconds")
    val q = hh.writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Update).start()
    try {
      // window [0,60): "hot" appears 12x among 20 distinct cold tokens —
      // freq > N/(k+1) = 32/9, so MG(8) must keep it
      val hotDoc = Seq.fill(6)("hot").mkString(" ")
      in.addData((ts(5), s"$hotDoc c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
        (ts(20), s"$hotDoc d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"))
      q.processAllAvailable()
      val rows = spark.table("hh_out")
        .select("ws", "candidates").as[(Timestamp, Seq[String])]
        .collect().toSeq
      val cands = rows.filter(_._1 == ts(0)).map(_._2).last
      assert(cands.length <= 8, s"state leaked past k: $cands")
      assert(cands.contains("hot"), s"hot token missing from $cands")
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence per content hash") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val deduped = StreamingAnalytics.dedupStream(
      in.toDF().toDF("ts", "text", "doc_id"), watermarkDelay = "10 seconds")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(100), "alpha", 1L), (ts(101), "beta", 2L))
      q.processAllAvailable()
      // duplicate content within the watermark window is dropped
      in.addData((ts(102), "alpha", 3L), (ts(103), "gamma", 4L))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L), s"got $got")
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on gap and on timeout") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Evt]
    val sessions = StreamingAnalytics.sessionize(
      in.toDS(), gapSeconds = 60, watermarkDelay = "5 seconds")
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 10s apart (one session), then 300s silence.
      // times start at 100 — a row whose event time equals the initial
      // watermark (0) is treated as late and dropped.
      in.addData(Evt(1L, ts(100)), Evt(1L, ts(110)))
      q.processAllAvailable()
      // same batch: user 1 reappears long after the gap → first session
      // closes inline; user 2 opens a session that will close by timeout
      in.addData(Evt(1L, ts(500)), Evt(2L, ts(490)))
      q.processAllAvailable()
      // advance the watermark far past everyone's last event + gap
      in.addData(Evt(3L, ts(1100)))
      q.processAllAvailable()
      in.addData(Evt(3L, ts(2100)))
      q.processAllAvailable()
      val got = spark.table("sessions").as[Session].collect()
        .map(s => (s.user_id, s.session_start.getTime / 1000,
          s.session_end.getTime / 1000, s.n_events)).toSet
      assert(got.contains((1L, 100L, 110L, 2L)), s"inline close missing: $got")
      assert(got.contains((1L, 500L, 500L, 1L)), s"timeout close missing: $got")
      assert(got.contains((2L, 490L, 490L, 1L)), s"timeout close missing: $got")
    } finally q.stop()
  }
}
