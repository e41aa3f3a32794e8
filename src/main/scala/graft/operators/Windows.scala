package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function layer (SURVEY.md §2.5 `EXT`): ranking, offset and frame
  * aggregates over the `events` fixture. One `WindowExec` per partition spec;
  * specs are shared across expressions so Spark plans a single sort+window
  * pass per spec. Window ordering always carries a unique tiebreak column
  * (`event_id`) — `ts` alone could collide and make lag/rank nondeterministic.
  */
object Windows {

  /** row_number / rank / dense_rank over per-user value ordering. */
  def rankEventsPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id").asc)
    events
      .select(
        col("user_id"), col("event_id"), col("event_type"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("user_id"), col("rn"))
  }

  /** lag/lead over event time per user: inter-event gap in exact
    * microseconds (integer epoch difference — `unix_timestamp` would floor
    * each side to whole seconds first, off by ±1s vs the true gap). */
  def sessionGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(
        col("user_id"), col("event_id"),
        lag(col("event_id"), 1).over(w).as("prev_event_id"),
        lead(col("event_id"), 1).over(w).as("next_event_id"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .as("gap_micros"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Frame-spec aggregates: running (unbounded-preceding) decimal-exact sum
    * and a centered 3-row moving count per user. */
  def runningTotals(events: DataFrame): DataFrame = {
    val ordered = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val centered = ordered.rowsBetween(-1, 1)
    events
      .select(
        col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(18, 6))).over(running)
          .cast("double").as("running_value"),
        count(lit(1)).over(centered).as("neighborhood_n"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** The remaining ranking/positional window builtins in one pass:
    * ntile, percent_rank, cume_dist, first/last/nth value — one ordered
    * spec + one full-partition frame, so Spark plans a single sort. */
  def windowShowcase(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events
      .select(
        col("user_id"), col("event_id"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first_value(col("event_id")).over(w).as("first_event"),
        last_value(col("event_id")).over(full).as("last_event"),
        nth_value(col("event_id"), 2).over(full).as("second_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Share-of-partition: value / per-user total (window agg without order —
    * whole-partition frame). */
  def valueShare(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .select(
        col("user_id"), col("event_id"),
        (col("value").cast(DecimalType(18, 6)).cast("double") /
          sum(col("value").cast(DecimalType(18, 6))).over(w).cast("double"))
          .as("value_share"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Time-based rolling aggregate: per event, the count and sum of the
    * user's events in the trailing hour — a RANGE frame over event time
    * (micros), not a ROWS frame, so ties and uneven event spacing are
    * handled by time, matching SQL `RANGE BETWEEN INTERVAL 1 HOUR
    * PRECEDING AND CURRENT ROW`. The sum is decimal-exact (frame
    * summation order differs across engines; decimals make it
    * order-independent). One window shuffle keyed by user. */
  def rollingHour(events: DataFrame): DataFrame = {
    val micros = expr("unix_micros(ts)")
    val w = Window.partitionBy(col("user_id")).orderBy(micros)
      .rangeBetween(-3600L * 1000 * 1000, 0)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast(DecimalType(18, 6))).over(w)
          .cast("double").as("sum_1h"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Cumulative DISTINCT count over a window — an aggregate Spark (and
    * ANSI SQL windows generally) cannot express directly
    * (`COUNT(DISTINCT) OVER` is unsupported), rewritten as the
    * first-occurrence-marker trick: row_number() = 1 within
    * (user, type) marks each type's first sighting, and a running sum
    * of markers over the user's timeline IS the cumulative distinct
    * count. Two window passes, both keyed by user (the second also
    * reuses the first's (user, type) sort prefix is NOT possible —
    * different partition keys — but both distribute by user, so the
    * exchange is reused and no global funnel exists at any scale).
    * Per-user state is one long — no distinct-set materialization. */
  def cumulativeDistinctTypes(events: DataFrame): DataFrame = {
    val firstSeen = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val timeline = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("is_first",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .withColumn("distinct_types", sum(col("is_first")).over(timeline))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("is_first"), col("distinct_types"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Exponentially-weighted moving average (α = 1/2) over each user's
    * trailing 8 events — the smoothing/anomaly-baseline primitive of
    * time-series monitoring. The textbook recursive EWMA cannot run as
    * a window function (each row depends on the previous RESULT, not
    * the previous value); with α = 1/2 the recursion unrolls to
    * power-of-two weights 2⁷..2⁰ over a FIXED lag depth, so the whole
    * thing is an 8-term lag chain in one window pass — and because the
    * weights are exact powers of two over integer-quantized values,
    * numerator and denominator are exact longs (order-free), with one
    * final double division. Short histories renormalize by the weight
    * mass actually present (the standard bias correction).
    *
    * One window shuffle keyed by user, 8 codegen'd lag expressions —
    * linear, no funnel at any scale. */
  def ewmaValue(events: DataFrame, depth: Int = 8): DataFrame =
    ewmaFractions(events, depth)
      .select(col("user_id"), col("event_id"), col("ts"), col("vc"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("ewma_centi"))
      .orderBy(col("user_id"), col("event_id"))

  /** Shared EWMA state as an exact fraction (num, den) per row — the
    * [[ewmaValue]] smoother before its one float division, reused by
    * the all-integer anomaly test in [[ewmaAnomalies]]. */
  private def ewmaFractions(events: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= 62, s"depth out of range: $depth")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val vc = floor(col("value") * lit(100.0)).cast("long")
    val base = events.select(col("user_id"), col("event_id"), col("ts"),
      vc.as("vc"))
    val terms = (0 until depth).map { k =>
      val weight = 1L << (depth - 1 - k)
      val v = if (k == 0) col("vc") else lag(col("vc"), k).over(w)
      (coalesce(v, lit(0L)) * lit(weight),
        when(v.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    base
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
  }

  /** Spike detection against the trailing EWMA baseline with ZERO
    * float arithmetic: a value is a spike when it exceeds `factor`×
    * the PREVIOUS event's EWMA, and `vc > factor·(num/den)` cross-
    * multiplies to the exact integer test `vc·den_prev > factor·
    * num_prev` — no division, no epsilon, no engine drift. First
    * events (no baseline) are never spikes. Same single user-keyed
    * window pass as [[ewmaValue]] plus two lags. */
  def ewmaAnomalies(events: DataFrame, depth: Int = 8,
      factor: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ewmaFractions(events, depth)
      .withColumn("prev_num", lag(col("num"), 1).over(w))
      .withColumn("prev_den", lag(col("den"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("ts"), col("vc"),
        coalesce(col("vc") * col("prev_den") >
          lit(factor.toLong) * col("prev_num"), lit(false)).as("is_spike"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Time-of-week traffic profile: event counts per (weekday, hour)
    * cell — the seasonality fingerprint capacity planning and anomaly
    * baselines read (this hour's volume vs the same weekday-hour cell
    * of history). One map-side-combined aggregate to a 168-row grid;
    * weekday is Monday=0 in both engines (Spark `weekday`, DuckDB
    * isodow−1) — day-of-week numbering is a classic cross-engine
    * mismatch. */
  def timeOfWeekProfile(events: DataFrame): DataFrame =
    events
      .select(weekday(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("dow"), col("hod"))

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands pattern: consecutive days collapse to one island
    * because `day − rank(day)` is constant within a run and jumps at
    * every gap. Engagement/retention analytics' daily-streak metric,
    * computed in three shuffles all keyed by user (distinct day set →
    * rank window → island agg → longest pick), integer/date arithmetic
    * only. Per-user state is its distinct DAY count — bounded by the
    * calendar, not the event volume. */
  def activityStreaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("rn", row_number().over(w))
      .withColumn("island", date_sub(col("day"), col("rn")))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    val pick = Window.partitionBy(col("user_id"))
      .orderBy(col("len").desc, col("start_day").asc)
    islands
      .withColumn("pick", row_number().over(pick))
      .groupBy(col("user_id"))
      .agg(max(when(col("pick") === 1, col("len"))).as("longest_streak"),
        max(when(col("pick") === 1, col("start_day"))).as("streak_start"),
        count(lit(1)).as("n_streaks"))
      .orderBy(col("user_id"))
  }

  /** w13: rolling distinct active users per hour — "users active in the
    * trailing `windowHours` hours", for every hour that has any event.
    * COUNT(DISTINCT) over a sliding frame is not sum-decomposable, so no
    * window function applies; the classic window-fn form would carry a
    * distinct-set per frame. Instead the count distributes as pure
    * relational algebra: dedup to (user, hour) presence pairs, explode
    * each pair onto the `windowHours` window-end hours it covers (a
    * narrow ×w generator), dedup again — a user active in several hours
    * of one window still counts once — and count per window end.
    *
    * Scale shape: state is bounded by |users| × |hours|, never by raw
    * event volume (the first distinct collapses events map-side); the
    * explode multiplies the COMPACT pair set by w, not the event log.
    * Both distincts are plain hash shuffles; no per-window sets, no
    * single-task funnel. */
  def rollingActiveUsers(events: DataFrame,
      windowHours: Int = 3): DataFrame = {
    val pairs = events
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hbin"))
      .distinct()
    val bins = pairs.select(col("hbin").as("wend")).distinct()
    val covered = pairs
      .select(col("user_id"),
        explode(sequence(col("hbin"),
          col("hbin") + expr(s"INTERVAL ${windowHours - 1} HOURS"),
          expr("INTERVAL 1 HOUR"))).as("wend"))
      .distinct()
    covered.join(bins, Seq("wend"), "left_semi")
      .groupBy(col("wend"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("wend"))
  }

  /** w19: GLOBAL cumulative concurrency series — how many shipments are
    * in flight (shipped, not yet received) on each day the fleet state
    * changes. The interval-overlap counting problem: +1 at ship, −1 at
    * receipt (open on d ⇔ ship ≤ d < receipt), prefix-sum over days.
    * The naive form is `SUM(delta) OVER (ORDER BY day)` — an
    * un-partitioned window, i.e. the single-partition funnel the plan
    * gate bans. Instead the textbook TWO-LEVEL distributed prefix sum:
    *
    *  1. collapse interval endpoints to O(days) delta rows with one
    *     partial-agg shuffle (the only stage that sees row volume);
    *  2. cumulative sum WITHIN each year via a year-partitioned window
    *     — parallel, bounded partitions (≤ 366 rows each), no funnel;
    *  3. exclusive prefix of the O(years) year totals via a sorted-array
    *     fold inside one global agg (the dq02/t20 pattern — an earlier
    *     all-days append-fold measured 5.0 s at sf0.1 from O(days²)
    *     interpreted copies; over years the fold is a few elements);
    *  4. broadcast the year offsets back and add.
    *
    * Every per-row stage distributes; the sequential step touches one
    * row per YEAR no matter the corpus size. */
  def openShipments(lineitem: DataFrame): DataFrame = {
    // the fixture lineitem carries no receipt column, so transit time is
    // injected deterministically: receipt = ship + (orderkey mod 30) + 1
    // days (the fixture-injection pattern of t06/t13/dq03)
    val ship = to_date(col("l_shipdate"))
    val receipt = date_add(ship, (col("l_orderkey") % 30 + 1).cast("int"))
    val deltas = lineitem
      .select(ship.as("day"), lit(1L).as("d"))
      .unionByName(lineitem.select(receipt.as("day"), lit(-1L).as("d")))
      .groupBy(col("day")).agg(sum(col("d")).as("delta"))
      .withColumn("yr", year(col("day")))
    val within = deltas.withColumn("cum_in_year",
      sum(col("delta")).over(Window.partitionBy(col("yr"))
        .orderBy(col("day"))))
    val offsets = deltas
      .groupBy(col("yr")).agg(sum(col("delta")).as("ytotal"))
      .agg(sort_array(collect_list(struct(col("yr"), col("ytotal"))))
        .as("arr"))
      .select(expr(
        """aggregate(arr,
          |  struct(CAST(0 AS BIGINT) AS run,
          |         CAST(array() AS ARRAY<STRUCT<yr: INT, off: BIGINT>>)
          |           AS out),
          |  (acc, x) -> struct(acc.run + x.ytotal,
          |    array_append(acc.out, named_struct('yr', x.yr,
          |      'off', acc.run))),
          |  acc -> acc.out)""".stripMargin).as("offs"))
      .select(explode(col("offs")).as("o"))
      .select(col("o.yr").as("yr"), col("o.off").as("off"))
    within.join(broadcast(offsets), "yr")
      .select(col("day"),
        (col("cum_in_year") + col("off")).as("open_shipments"))
      .orderBy(col("day"))
  }

  /** w20: OHLC bars — per (event_type, event-time hour): the opening
    * value (earliest event, ties by event_id), high, low, closing
    * value (latest event), and volume. The canonical time-bucketed
    * downsample every monitoring/market/metrics pipeline runs; beside
    * the EWMA pair (w15/w16) it gives the bucket-exact rather than
    * exponentially-faded read of the same stream.
    *
    * Determinism: open/close are SELECTION via `min_by`/`max_by` over
    * the (ts, event_id) struct — no float arithmetic at all, so every
    * output value is an input value bit-for-bit; high/low are plain
    * min/max.
    *
    * Plan shape: ONE (type, hour) partial aggregate, map-side combined
    * — min_by/max_by partial-aggregate like any other agg, so the
    * shuffle carries one candidate row per (type, hour, split), never
    * the events. Output is bucket-count-sized. */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("hour"))

  /** w22: time-weighted average (TWAP) per (event_type, day) — the
    * irregular-interval mean every metrics/market pipeline needs where
    * w20's OHLC gives bucket extremes: each observation holds until
    * the next one, so its weight is its holding interval, and a burst
    * of identical readings no longer dominates the mean the way it
    * does the plain average (emitted beside it for the contrast). The
    * day's last observation has no interval and is excluded — the
    * standard open-interval convention.
    *
    * Determinism: values quantize to micros BEFORE weighting, so
    * Σ micro·Δt and Σ Δt are exact longs; the two output means are
    * one division each. Overflow headroom: |micro| ≤ ~3·10⁸ here and
    * Δt ≤ 86 400, so a day's weighted sum stays < 2⁶³ up to ~3·10⁵
    * same-type events/day.
    *
    * Plan shape: one lead window keyed (type, day) — bounded
    * partitions, full parallelism — and one (type, day) partial agg;
    * output is types × days. */
  def twapDaily(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        floor(col("value") * lit(1000000.0)).cast("long").as("vmicro"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .withColumn("dt",
        unix_timestamp(col("next_ts")) - unix_timestamp(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("sum_dt_s"),
        sum(col("vmicro") * col("dt")).as("sum_wv"),
        sum(col("vmicro")).as("sum_v"))
      .filter(col("sum_dt_s") > 0)
      .select(col("event_type"), col("day"), col("n_intervals"),
        col("sum_dt_s"),
        (col("sum_wv").cast("double") / col("sum_dt_s").cast("double"))
          .as("twap_micros"),
        (col("sum_v").cast("double") / col("n_intervals").cast("double"))
          .as("mean_micros"))
      .orderBy(col("event_type"), col("day"))
  }

  /** w21: retention cohort matrix — users grouped by first-activity
    * day, activity tracked per week-of-age: the (cohort, age) →
    * active-users/retention-share triangle every product/growth
    * dashboard reads, and for a data platform the engagement-decay
    * read that decides how long behavioral logs stay hot. Week 0
    * retention is 1.0 by construction (every user is active in their
    * first week — the standard sanity row).
    *
    * Determinism: cohort day is a MIN selection; ages are integer
    * datediffs div 7; retention is one double division of exact longs.
    *
    * Plan shape: a user-keyed first-day aggregate (map-side combined),
    * a distinct on (user, day) bounding the activity stream to one row
    * per user-day, a user-keyed join, then a (cohort, age) aggregate —
    * output is cohorts × ages, dashboard-sized. The count_distinct in
    * the matrix agg is exact; (user, day) rows are already distinct so
    * it partial-aggregates without a second expansion. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val userDays = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val matrix = userDays.join(firstDay, "user_id")
      .select(col("cohort_day"),
        expr("CAST(datediff(day, cohort_day) div 7 AS BIGINT)")
          .as("age_weeks"),
        col("user_id"))
      .groupBy(col("cohort_day"), col("age_weeks"))
      .agg(count_distinct(col("user_id")).as("active_users"))
    val cohortSize = firstDay.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    matrix.join(cohortSize, "cohort_day")
      .select(col("cohort_day"), col("age_weeks"), col("active_users"),
        col("cohort_size"),
        (col("active_users").cast("double") /
          col("cohort_size").cast("double")).as("retention"))
      .orderBy(col("cohort_day"), col("age_weeks"))
  }

  /** w23: WATERMARK-LATENESS profile — the out-of-orderness table that
    * SIZES every `withWatermark` delay the streaming suite (§2.9)
    * otherwise picks by folklore: per event, lateness = the high
    * watermark at its arrival (running max event-time over arrival
    * order, `event_id` as the ingest sequence — the documented proxy)
    * minus its own event time, bucketed into the delays an operator
    * would actually configure (on-time / ≤1m / ≤5m / ≤1h / beyond).
    * The reader picks the watermark delay directly off the histogram:
    * each bucket's cumulative share IS the fraction of events a delay
    * of that size retains, and `max_late_us` bounds the loss of any
    * shorter choice. Lateness is an exact integer micros difference
    * (the w02 discipline — `unix_timestamp` would floor each side to
    * seconds first).
    *
    * Scale: the running max is a per-event-type ordered window —
    * parallel across types, and the per-type sequential read is the
    * question itself (a watermark IS a sequential property of one
    * stream's arrival order; in production the partition key is the
    * source partition, same shape). One (type, bucket)-keyed partial
    * agg follows → at most 5·|types| rows. */
  def watermarkLateness(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("late_us",
        unix_micros(max(col("ts")).over(w)) - unix_micros(col("ts")))
      .withColumn("late_bucket",
        when(col("late_us") === 0L, "b0_on_time")
          .when(col("late_us") <= 60L * 1000000L, "b1_under_1m")
          .when(col("late_us") <= 300L * 1000000L, "b2_under_5m")
          .when(col("late_us") <= 3600L * 1000000L, "b3_under_1h")
          .otherwise("b4_over_1h"))
      .groupBy(col("event_type"), col("late_bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(col("late_us")).as("max_late_us"))
      .orderBy(col("event_type"), col("late_bucket"))
  }
}
