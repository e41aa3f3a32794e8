package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for stateful sessionization (`ts` in epoch microseconds —
  * integer state arithmetic, no timestamp-encoder subtleties in state). */
case class SessionEvent(user_id: Long, event_id: Long, tsMicros: Long)

/** The open session kept in per-key state between triggers. */
case class OpenSession(startMicros: Long, endMicros: Long, nEvents: Int)

/** A closed session emitted downstream. */
case class ClosedSession(user_id: Long, session_start: Long,
    session_end: Long, n_events: Int)

/** Custom streaming state: gap-based sessionization via
  * `flatMapGroupsWithState` — the `KeyValueGroupedDataset` state API
  * (SURVEY §2.9's custom-state face). Each trigger folds the group's new
  * events into the open session; a gap larger than `gapMicros` closes the
  * session and emits it (Append mode). The final open session stays in
  * state — production deployments add an event-time timeout to flush idle
  * sessions; kept timeout-free here so unit tests are deterministic.
  *
  * Semantics parity: on a fully-delivered in-order stream this emits
  * exactly the non-final sessions of [[EventTimeOps.sessionizeBatch]]
  * (asserted in StreamingSpec).
  */
object Sessionizer {

  /** [[sessionize]] with an EVENT-TIME TIMEOUT: the production variant
    * that also flushes a session whose user simply went idle — without
    * it, the last session of every user stays in state forever and is
    * never emitted. The timeout is driven by the WATERMARK: after each
    * trigger the open session arms a timeout at `session_end + gap`;
    * when the watermark (set by the caller on the input, see
    * StreamingSpec) passes that instant with no new events for the
    * key, Spark fires the group function with an empty iterator and
    * `state.hasTimedOut`, and the open session closes and emits.
    *
    * Same per-key O(1) state as the timeout-free form; determinism in
    * tests comes from stepping the watermark explicitly (add a late
    * marker event, process, assert). */
  def sessionizeWithTimeout(events: Dataset[SessionEvent],
      gapMicros: Long = 30L * 60 * 1000000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, newEvents: Iterator[SessionEvent],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startMicros, s.endMicros,
              s.nEvents))
          } else {
            val sorted = newEvents.toSeq.sortBy(e => (e.tsMicros, e.event_id))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMicros - s.endMicros > gapMicros =>
                  closed += ClosedSession(uid, s.startMicros, s.endMicros,
                    s.nEvents)
                  cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
                case Some(s) =>
                  cur = Some(OpenSession(s.startMicros,
                    math.max(s.endMicros, e.tsMicros), s.nEvents + 1))
                case None =>
                  cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // closes when the watermark passes the gap horizon; clamped
              // to watermark+1ms because Spark rejects a timeout at or
              // before the current watermark with IllegalArgumentException.
              // FlatMapGroupsWithStateExec already filters input rows
              // older than the watermark in EventTimeTimeout mode
              // (StreamingSpec's straggler test verifies the drop), so the
              // clamp is insurance against an engine that delivers a late
              // row anyway — without it one straggler kills the query.
              val horizonMs = (s.endMicros + gapMicros) / 1000L
              state.setTimeoutTimestamp(
                math.max(horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  def sessionize(events: Dataset[SessionEvent],
      gapMicros: Long = 30L * 60 * 1000000): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, newEvents: Iterator[SessionEvent],
            state: GroupState[OpenSession]) =>
          val sorted = newEvents.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val closed = Seq.newBuilder[ClosedSession]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMicros - s.endMicros > gapMicros =>
                closed += ClosedSession(uid, s.startMicros, s.endMicros,
                  s.nEvents)
                cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
              case Some(s) =>
                cur = Some(OpenSession(s.startMicros,
                  math.max(s.endMicros, e.tsMicros), s.nEvents + 1))
              case None =>
                cur = Some(OpenSession(e.tsMicros, e.tsMicros, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
