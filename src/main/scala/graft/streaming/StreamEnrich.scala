package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment: join a stream against a static dimension
  * table. The static side is broadcast — each micro-batch joins against
  * the executor-resident copy with NO stream-side shuffle and no join
  * state (unlike stream-stream joins, a static row can always match, so
  * nothing is watermark-evicted). The standard shape for decorating an
  * event stream with slowly-changing reference data; with Spark's
  * broadcast-hash join the dimension is re-resolvable per batch, so a
  * refreshed dimension snapshot is picked up on restart. */
object StreamEnrich {

  /** Attach per-user attributes to an event stream. `users` is static
    * (user_id, attrs...); inner join drops events for unknown users —
    * use leftOuter to keep them with null attrs. */
  def enrichEvents(events: DataFrame, users: DataFrame,
      joinType: String = "inner"): DataFrame =
    events.join(broadcast(users), Seq("user_id"), joinType)
}
