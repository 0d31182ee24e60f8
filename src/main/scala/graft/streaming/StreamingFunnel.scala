package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the incremental leg of
  * `ops/Sessions.funnelUserTimes`: per user, advance a stage cursor as
  * qualifying events arrive (stage i counts only at/after the stage-(i-1)
  * time), emit one row per stage REACHED, as it is reached.
  *
  * State per key is O(|stages|) — just the reached-stage times, never the
  * event list. Batches can deliver out of order inside the watermark
  * slack, so each batch's events fold in (ts, id) order and a batch that
  * back-fills an earlier stage can cascade later stages in the same fold.
  * Late events BELOW an already-reached stage time are ignored (the batch
  * funnel would have used them — the watermark bounds that divergence,
  * exactly the watermark-vs-batch contract the streaming validator
  * documents). An event-time timeout finalizes users after `idleMs` so
  * abandoned funnels leave state.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_id: Long, event_type: String,
                         ts: Timestamp)
  case class FunnelState(reachedNs: Seq[Long]) // times of stages reached so far
  case class StageReached(user_id: Long, stage: Int, stage_name: String,
                          ts: Timestamp)

  /** Full-precision epoch nanos of a Timestamp — `getTime` alone is only
    * milliseconds, and the batch funnel orders by full-precision event
    * time, so comparing at ms would diverge on sub-ms-spaced events. */
  private def tsNanos(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

  /** One output row per (user, stage) the first time that stage is
    * reached. Input must be watermarked on `ts` BEFORE calling. */
  def stageEvents(events: Dataset[FunnelEvent], stages: Seq[String],
                  idleMs: Long = Long.MaxValue / 4): Dataset[StageReached] = {
    require(stages.nonEmpty, "stages must be non-empty")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            state.remove() // funnel abandoned: free the per-user state
            Iterator.empty
          } else {
            var reached = state.getOption.map(_.reachedNs).getOrElse(Seq.empty)
            val out = Seq.newBuilder[StageReached]
            rows.toSeq.sortBy(e => (tsNanos(e.ts), e.event_id)).foreach { e =>
              val next = reached.length
              if (next < stages.length && e.event_type == stages(next) &&
                (next == 0 || tsNanos(e.ts) >= reached(next - 1))) {
                reached = reached :+ tsNanos(e.ts)
                out += StageReached(userId, next, stages(next), e.ts)
              }
            }
            if (reached.length < stages.length) {
              state.update(FunnelState(reached))
              if (!state.hasTimedOut)
                state.setTimeoutTimestamp(
                  state.getCurrentWatermarkMs() + idleMs)
            } else state.remove() // funnel complete: nothing more to track
            out.result().iterator
          }
      }
  }
}
