package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming sessionization: both the declarative session_window form and
  * the custom-state flatMapGroupsWithState form converge to the batch
  * sessionizer (`ops/Sessions`) on the same events. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSessions._

  private def ts(min: Int) =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  // u1: events at 10:00, 10:05 (one session), then 10:59 (gap > 30m → new);
  // u2: single event at 10:10
  private val eventsData = Seq(
    SessionEvent(1L, 101L, ts(0)), SessionEvent(1L, 102L, ts(5)),
    SessionEvent(1L, 103L, ts(59)), SessionEvent(2L, 201L, ts(10)))
  // a late high-watermark event pushes the watermark far past all sessions
  private val flush = SessionEvent(9L, 901L, Timestamp.valueOf("2026-01-02 00:00:00"))

  test("declarative session_window matches the batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = sessionAgg(stream.toDF(), gap = "30 minutes",
      watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_agg")
      .outputMode("append").start()
    try {
      stream.addData(eventsData: _*)
      q.processAllAvailable()
      stream.addData(flush) // advance watermark → sessions emit
      q.processAllAvailable()
      val got = spark.table("sess_agg")
        .filter(col("user_id") < 9)
        .select(col("user_id"), col("session_start").cast("string"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // batch reference on the same rows (epoch-nanos form)
      val batch = graft.ops.Sessions.sessionStats(
          eventsData.toDF().select(col("user_id"), col("event_id"),
            (col("ts").cast("double") * 1e9).cast("long").as("tsn")),
          "user_id", "event_id", "tsn", gapNanos = 30L * 60 * 1000000000L)
        .select(col("user_id"), col("session_start").cast("string"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set((1L, "2026-01-01 10:00:00", 2L),
        (1L, "2026-01-01 10:59:00", 1L), (2L, "2026-01-01 10:10:00", 1L)))
    } finally q.stop()
  }

  test("custom-state sessionizer: late cross-batch event keeps fields consistent") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = sessionizeWithState(
      stream.toDF().withWatermark("ts", "2 hours").as[SessionEvent],
      gapMs = 30L * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      stream.addData(SessionEvent(1L, 5L, ts(10)))
      q.processAllAvailable()
      // LATE but above-watermark: extends the open session BACKWARDS
      stream.addData(SessionEvent(1L, 3L, ts(5)))
      q.processAllAvailable()
      stream.addData(flush)
      q.processAllAvailable()
      val rows = spark.table("sess_late").filter(col("user_id") === 1)
        .select("session_start", "session_end", "n_events",
          "first_event_id", "last_event_id")
        .collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(r.getTimestamp(0) == ts(5) && r.getTimestamp(1) == ts(10),
        s"start/end ${r.getTimestamp(0)}/${r.getTimestamp(1)}")
      assert(r.getLong(2) == 2 && r.getLong(3) == 3L && r.getLong(4) == 5L,
        s"n/first/last ${r.getLong(2)}/${r.getLong(3)}/${r.getLong(4)}")
    } finally q.stop()
  }

  test("custom-state sessionizer: gap close, cap close, event ids") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val sessions = sessionizeWithState(
      stream.toDF().withWatermark("ts", "1 minute").as[SessionEvent],
      gapMs = 30L * 60 * 1000, maxEvents = 2)
    val q = sessions.writeStream.format("memory").queryName("sess_state")
      .outputMode("append").start()
    try {
      stream.addData(eventsData: _*)
      q.processAllAvailable()
      stream.addData(flush)
      q.processAllAvailable()
      val got = spark.table("sess_state").filter(col("user_id") < 9)
        .select("user_id", "n_events", "first_event_id", "last_event_id",
          "close_reason")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toSet
      // u1 first session hits the cap=2 (101,102) and closes eagerly;
      // 103 opens a new session that closes by gap timeout; u2 by gap
      assert(got == Set(
        (1L, 2L, 101L, 102L, "cap"),
        (1L, 1L, 103L, 103L, "gap"),
        (2L, 1L, 201L, 201L, "gap")), s"got $got")
    } finally q.stop()
  }
}
