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
