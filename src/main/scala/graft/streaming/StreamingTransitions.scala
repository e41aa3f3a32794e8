package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed event for streaming transition extraction (`tsMicros` epoch
  * microseconds — integer state, no timestamp-encoder subtleties). */
case class TypedEvent(user_id: Long, event_id: Long, tsMicros: Long,
    event_type: String)

/** The last-seen event kept in per-user state between triggers. */
case class LastEvent(tsMicros: Long, eventId: Long, eventType: String)

/** One consecutive-step edge emitted downstream. */
case class Transition(user_id: Long, src: String, dst: String)

/** Streaming twin of [[graft.operators.Graph.transitionCounts]]'s step
  * extraction: the per-user `lag` window cannot run on an unbounded
  * stream (no final ordering ever exists), so the "previous event" is
  * ONE ROW of `flatMapGroupsWithState` state per user — each arriving
  * event emits the (prev → current) edge and replaces the state. The
  * Markov counts are then an ordinary streaming aggregation over the
  * emitted edges.
  *
  * State is O(1) per user forever (one LastEvent), so no watermark is
  * needed for state growth — production adds an idle-user timeout only
  * to bound the KEY COUNT. Parity: on a fully-delivered in-order
  * stream the emitted multiset of (src, dst) steps equals the batch
  * lag-window's (asserted in StreamingSpec). */
object StreamingTransitions {

  def transitions(events: Dataset[TypedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, newEvents: Iterator[TypedEvent],
            state: GroupState[LastEvent]) =>
          val sorted = newEvents.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          val out = Seq.newBuilder[Transition]
          var last = state.getOption
          sorted.foreach { e =>
            last.foreach(l => out += Transition(uid, l.eventType, e.event_type))
            last = Some(LastEvent(e.tsMicros, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
