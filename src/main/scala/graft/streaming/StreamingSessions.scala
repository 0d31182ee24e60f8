package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the incremental leg of `ops/Sessions`.
  *
  * Two implementations, by the §7.4 preference order:
  *
  * 1. [[sessionAgg]] — DECLARATIVE: Structured Streaming's native
  *    `session_window` gap-merge aggregation. State is managed by the
  *    engine, bounded by the watermark; this is the form to use when
  *    per-session output is count/min/max-shaped.
  *
  * 2. [[sessionizeWithState]] — CUSTOM STATE via
  *    `flatMapGroupsWithState` + event-time timeout, for session
  *    semantics the built-in cannot express (here: sessions also close
  *    when they reach a max event count — a bot-mitigation rule — and
  *    each closed session reports its first/last event ids). State per
  *    key is O(1) (running aggregates only, never the event list);
  *    sessions close either by gap (event-time timeout fires after the
  *    watermark passes last_ts + gap) or by the cap at append time.
  */
object StreamingSessions {

  /** Declarative gap-session aggregation: (user_id, session start/end,
    * n_events) per closed session, append-mode emission once the
    * watermark passes the session's end + gap. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select("user_id", "session_start", "session_end", "n_events")

  case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(startMs: Long, lastMs: Long, firstId: Long,
                          lastId: Long, n: Long)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           first_event_id: Long, last_event_id: Long,
                           close_reason: String)

  /** Custom-state sessionizer: gap timeout via event-time timers PLUS a
    * max-events cap the declarative form can't express. Input must be
    * watermarked on `ts` BEFORE calling (timeout correctness). */
  def sessionizeWithState(events: Dataset[SessionEvent], gapMs: Long,
                          maxEvents: Long = Long.MaxValue): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          def close(s: SessionState, reason: String) = ClosedSession(
            userId, new Timestamp(s.startMs), new Timestamp(s.lastMs),
            s.n, s.firstId, s.lastId, reason)
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed lastMs + gap with no new events: gap close
            val out = state.getOption.map(close(_, "gap")).toSeq
            state.remove()
            out.iterator
          } else {
            // fold this batch's events in event-time order (batches can
            // deliver out of order within the watermark slack)
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs && s.n < maxEvents =>
                  // a LATE event (above watermark, below lastMs) extends the
                  // session backwards: first/last are by (ts, id), not by
                  // arrival order — keep every field consistent with that
                  val isNewLast = t > s.lastMs ||
                    (t == s.lastMs && e.event_id > s.lastId)
                  val isNewFirst = t < s.startMs ||
                    (t == s.startMs && e.event_id < s.firstId)
                  cur = Some(SessionState(
                    startMs = math.min(s.startMs, t),
                    lastMs = math.max(s.lastMs, t),
                    firstId = if (isNewFirst) e.event_id else s.firstId,
                    lastId = if (isNewLast) e.event_id else s.lastId,
                    n = s.n + 1))
                case Some(s) =>
                  closed += close(s,
                    if (s.n >= maxEvents) "cap" else "gap")
                  cur = Some(SessionState(t, t, e.event_id, e.event_id, 1))
                case None =>
                  cur = Some(SessionState(t, t, e.event_id, e.event_id, 1))
              }
            }
            cur.foreach { s =>
              if (s.n >= maxEvents) { // cap reached exactly: close eagerly
                closed += close(s, "cap")
                state.remove()
              } else {
                state.update(s)
                // close when the WATERMARK (not wall clock) passes gap end
                state.setTimeoutTimestamp(s.lastMs + gapMs)
              }
            }
            closed.result().iterator
          }
      }
  }
}
