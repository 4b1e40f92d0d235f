package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful sessionization with `flatMapGroupsWithState` — the custom-
  * state streaming operator (SURVEY §2.10 maps the reference's
  * incremental batch onto Structured Streaming; gap-based sessions are
  * the canonical stateful extension a 100-TB event pipeline needs).
  *
  * Semantics: events of a key belong to one session while consecutive
  * gaps stay ≤ `gapSeconds`; a longer gap closes the session. In
  * streaming mode, an open session is held in [[GroupState]] across
  * micro-batches and emitted when the event-time watermark passes its
  * timeout; in batch mode every session (including the trailing one) is
  * emitted immediately — same grouping, no state carry needed.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           sum_value: Double)

  def sessions(events: Dataset[Event], gapSeconds: Long,
               streaming: Boolean): Dataset[Session] = {
    implicit val se: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val ss: org.apache.spark.sql.Encoder[OpenSession] = Encoders.product[OpenSession]
    val gapMs = gapSeconds * 1000L

    def toSession(uid: Long, s: OpenSession): Session =
      Session(uid, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
        s.n, s.sum)

    def fn(uid: Long, it: Iterator[Event], state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed the open session's gap window: emit and clear
        val out = state.getOption.map(toSession(uid, _)).iterator
        state.remove()
        return out
      }
      val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.lastMs <= gapMs =>
            open = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += toSession(uid, s)
            open = Some(OpenSession(t, t, 1L, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      if (streaming) {
        open.foreach { s =>
          state.update(s)
          // a timeout at/behind the current watermark is rejected by the
          // state store (late-but-admitted events, or gap < watermark
          // delay) — clamp to strictly after the watermark so the session
          // times out on the next batch instead of crashing the query
          state.setTimeoutTimestamp(
            math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      } else {
        // batch: data is complete, the trailing session is final too
        (closed.result() ++ open.map(toSession(uid, _))).iterator
      }
    }

    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }
}
