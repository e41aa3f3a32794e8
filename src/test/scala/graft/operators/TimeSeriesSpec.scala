package graft.operators

import graft.SparkSpec
import graft.streaming.EventTimeOps
import org.apache.spark.sql.functions._

/** Time-series window ops: trailing time-RANGE aggregates and
  * gap-filled dense series. */
class TimeSeriesSpec extends SparkSpec {

  private def t(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("rollingHour counts exactly the trailing-hour frame, inclusive") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, t("2026-01-01T10:00:00Z"), 1.0),
      (1L, 11L, t("2026-01-01T10:30:00Z"), 2.0),
      (1L, 12L, t("2026-01-01T11:00:00Z"), 4.0), // exactly 1h after e10: in
      (1L, 13L, t("2026-01-01T13:00:00Z"), 8.0), // isolated
      (2L, 20L, t("2026-01-01T10:45:00Z"), 16.0) // other user untouched
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Windows.rollingHour(events).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("n_1h"),
        r.getAs[Double]("sum_1h"))).toSeq
    assert(out == Seq((10L, 1L, 1.0), (11L, 2L, 3.0), (12L, 3L, 7.0),
      (13L, 1L, 8.0), (20L, 1L, 16.0)))
  }

  test("gapFillHourly emits explicit zero rows for missing hours") {
    import spark.implicits._
    val events = Seq(
      (1L, t("2026-01-01T10:10:00Z"), "click", 1.0),
      (2L, t("2026-01-01T12:20:00Z"), "click", 1.0), // 11:00 missing
      (3L, t("2026-01-01T10:40:00Z"), "view", 1.0)
    ).toDF("event_id", "ts", "event_type", "value")
    val out = EventTimeOps.gapFillHourly(events).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("h").toInstant.toString,
        r.getAs[Long]("n_events"))).toSeq
    assert(out == Seq(
      ("click", "2026-01-01T10:00:00Z", 1L),
      ("click", "2026-01-01T11:00:00Z", 0L),
      ("click", "2026-01-01T12:00:00Z", 1L),
      ("view", "2026-01-01T10:00:00Z", 1L)))
  }

  test("perSourceCap keeps the longest `cap` docs per source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a", "s1", 100L), (2L, "a", "s1", 300L), (3L, "a", "s1", 200L),
      (4L, "b", "s2", 50L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = Sampling.perSourceCap(docs, cap = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("rk"))).toSeq
    assert(out == Seq(("s1", 2L, 1L), ("s1", 3L, 2L), ("s2", 4L, 1L)))
  }

  test("OHLC bars pick open/close by arrival and bound high/low") {
    import spark.implicits._
    val events = Seq(
      (10L, t("2026-01-01T10:05:00Z"), 1L, "buy", 5.0),
      (11L, t("2026-01-01T10:10:00Z"), 1L, "buy", 9.0),
      (12L, t("2026-01-01T10:55:00Z"), 1L, "buy", 2.0),
      (13L, t("2026-01-01T11:01:00Z"), 1L, "buy", 7.0), // next hour
      (14L, t("2026-01-01T10:30:00Z"), 2L, "sell", 4.0),
      // same ts as 14: event_id breaks the tie for open/close
      (15L, t("2026-01-01T10:30:00Z"), 2L, "sell", 6.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Windows.ohlcBars(events).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("hour").toInstant.toString) ->
        ((r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events")))).toMap
    assert(got == Map(
      ("buy", "2026-01-01T10:00:00Z") -> ((5.0, 9.0, 2.0, 2.0, 3L)),
      ("buy", "2026-01-01T11:00:00Z") -> ((7.0, 7.0, 7.0, 7.0, 1L)),
      ("sell", "2026-01-01T10:00:00Z") -> ((4.0, 6.0, 4.0, 6.0, 2L))))
    // fixture invariants: low <= open, close <= high everywhere
    val fix = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val bars = Windows.ohlcBars(fix).collect()
    assert(bars.nonEmpty)
    assert(bars.forall { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      l <= o && o <= h && l <= c && c <= h
    })
  }

  test("twapDaily: holding intervals weight the mean, last point drops") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // value 10 held 30 s, value 100 held 10 s, value 7 closes the day
    // (no interval) → twap = (10e6*30 + 100e6*10) / 40
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "tick", 10.0),
      (2L, ts("2024-01-01 10:00:30"), "tick", 100.0),
      (3L, ts("2024-01-01 10:00:40"), "tick", 7.0)
    ).map { case (id, t, ty, v) => (0L, t, id, ty, v) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val r = graft.operators.Windows.twapDaily(events).head()
    assert(r.getAs[Long]("n_intervals") == 2L)
    assert(r.getAs[Long]("sum_dt_s") == 40L)
    assert(r.getAs[Double]("twap_micros") ==
      (10000000L * 30 + 100000000L * 10).toDouble / 40.0)
    assert(r.getAs[Double]("mean_micros") ==
      (10000000L + 100000000L).toDouble / 2.0)
  }

  test("retentionCohorts: hand-computed matrix, week-0 row is 1.0") {
    import spark.implicits._
    def ts(day: Int) = java.sql.Timestamp.valueOf(
      f"2024-01-${day}%02d 12:00:00")
    // users 1,2 start Jan 1 (cohort A); user 3 starts Jan 2 (cohort B)
    // user 1 returns on day 9 (age week 1); user 2 never returns;
    // user 3 returns day 16 (age week 2)
    val events = Seq(
      (1L, ts(1)), (1L, ts(9)),
      (2L, ts(1)),
      (3L, ts(2)), (3L, ts(16))
    ).map { case (u, t) => (u, t, 0L, "view", 1.0) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = graft.operators.Windows.retentionCohorts(events).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_day").toString,
        r.getAs[Long]("age_weeks")) ->
        ((r.getAs[Long]("active_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention")))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-01-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-01-02", 0L) -> ((1L, 1L, 1.0)),
      ("2024-01-02", 2L) -> ((1L, 1L, 1.0))))
  }
}
