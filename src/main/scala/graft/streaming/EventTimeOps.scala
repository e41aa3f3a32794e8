package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time operators shared by the batch and streaming faces — the same
  * declarative plan runs under both engines (SURVEY §2.9: the reference's
  * hour-partitioned ingest is streaming-shaped; these are the event-time
  * analytics it lacks).
  */
object EventTimeOps {

  /** Tumbling-window counts + exact sums per (window, event_type). Batch
    * form — epoch-aligned windows, deterministic output order. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** Sliding event-time windows (length > slide ⇒ overlapping): each
    * event lands in length/slide windows, here 10min/5min ⇒ exactly two.
    * Spark assigns all windows in one pass (an internal explode by the
    * overlap factor), so cost is overlap × input — linear, shuffled on
    * (window, type) with map-side combine, the same scale shape as the
    * tumbling form. Window origin is epoch-aligned, matching DuckDB's
    * time_bucket for minute-granularity intervals. */
  def slidingCounts(events: DataFrame, windowLen: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("wstart"),
        col("window.end").as("wend"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** Streaming form: watermarked so state for closed windows is evicted —
    * unbounded-state-safe on an infinite stream. Append-mode compatible.
    * `slide` < `windowLen` gives the sliding form ([[slidingCounts]]'s
    * stream twin): state grows by the overlap factor, still bounded by
    * the watermark horizon. */
  /** Streaming OHLC bars — w20's stream twin: open/close are
    * `min_by`/`max_by` SELECTION over the (ts, event_id) struct, which
    * partial-aggregates in streaming state exactly like any other agg
    * (state per open (window, type) = one candidate row per function,
    * not the events), watermark-evicted once the window closes. The
    * same selection-only determinism contract as the batch form:
    * every emitted value is an input value bit-for-bit, so
    * stream-vs-batch parity is exact equality, not tolerance. */
  def ohlcBarsStream(events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_events"))

  def windowedCountsStream(events: DataFrame, watermark: String = "10 minutes",
      windowLen: String = "1 hour", slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide.getOrElse(windowLen)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Spark's NATIVE session windows — the builtin counterpart to
    * [[sessionizeBatch]] (window-function formulation) and [[Sessionizer]]
    * (explicit streaming state). Semantics nuance: session_window merges
    * an event into the previous session iff its timestamp is STRICTLY
    * before prev_end (= prev_ts + gap); an exact-gap arrival starts a new
    * session, and session_end = last_ts + gap (not max ts) — the oracle
    * mirrors both. */
  def nativeSessionWindows(events: DataFrame,
      gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Gap-based sessionization, batch form: a session breaks when the gap to
    * the previous event exceeds `gapMinutes`. Exact-microsecond gap
    * arithmetic (sub-second safe), session numbering via running sum —
    * the window-function formulation of what [[Sessionizer]] does with
    * explicit state on a stream. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapMicros = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val prevTs = lag(col("ts"), 1).over(w)
    val newSession = when(prevTs.isNull ||
      (unix_micros(col("ts")) - unix_micros(prevTs)) > gapMicros, 1)
      .otherwise(0)
    events
      .withColumn("new_s", newSession)
      .withColumn("session_n",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy(col("user_id"), col("session_n"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_n"))
  }

  /** Gap-filled hourly series: per event type, the count for EVERY hour
    * between the type's first and last event — missing hours surface as
    * explicit zero rows, which downstream rolling averages and anomaly
    * detectors need (a dense series, not a sparse one).
    *
    * Spark-first shape: `sequence(first, last, 1 hour)` + `explode`
    * generates the slot spine DISTRIBUTED per group (no driver loop, no
    * cross join against a global calendar); the left join back to the
    * sparse counts is an equi-join on (type, hour). Slot count = time
    * span × groups, linear. */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val slots = hourly
      .groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("h"))
    slots.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("event_type"), col("h"))
  }
}
