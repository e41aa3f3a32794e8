package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows to interval rows containing
  * them — composed from existing ops via time-bin bucketization (the
  * standard scalable formulation; no custom strategy, SURVEY §7
  * preference order).
  *
  * A naive range join is a theta join — nested-loop at scale. Binning
  * makes it an equi-join: points key by their time bin; intervals explode
  * to every bin they cover; join on (bin [+ optional keys]) then refine
  * with the exact containment predicate. Each point matches an interval
  * in exactly the point's own bin, so no dedup is needed. Shuffle volume
  * is |points| + |intervals|·(avg bins per interval) — linear, with bin
  * width trading replication against per-bin fanout.
  */
object RangeJoin {

  /** Join `points` (event-time `pointTime`) to `intervals`
    * ([startCol, endCol], inclusive) sharing `keys` (may be empty for a
    * pure range join). Returns point rows × matched interval columns. */
  def binnedIntervalJoin(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      keys: Seq[String] = Seq.empty,
      binMicros: Long = 3600L * 1000000): DataFrame = {
    val p = points.withColumn("_bin",
      floor(unix_micros(col(pointTime)) / binMicros))
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binMicros),
        floor(unix_micros(col(endCol)) / binMicros))))
    p.join(iv, Seq("_bin") ++ keys)
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) <= col(endCol))
      .drop("_bin")
  }

  /** Oracle-checked instantiation: assign every event to its containing
    * session interval (sessions from the 30-min-gap batch sessionizer).
    * Every event lands in exactly one session by construction — the
    * containment query form of w06's assignment. */
  def eventSessionAssignment(events: DataFrame): DataFrame = {
    val sessions = graft.streaming.EventTimeOps.sessionizeBatch(events, 30)
      .select(col("user_id"), col("session_n"),
        col("session_start"), col("session_end"))
    binnedIntervalJoin(
      events.select(col("event_id"), col("user_id"), col("ts")), "ts",
      sessions, "session_start", "session_end", keys = Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("session_n"))
      .orderBy(col("event_id"))
  }
}
