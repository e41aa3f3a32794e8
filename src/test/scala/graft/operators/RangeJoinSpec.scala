package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned interval join: containment correctness across bin boundaries,
  * boundary inclusivity, no duplicate matches, key isolation. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("points match exactly the intervals containing them") {
    import spark.implicits._
    // interval A spans 3 one-hour bins; B is inside one bin
    val intervals = Seq(
      ("A", ts("2026-01-01T10:30:00Z"), ts("2026-01-01T12:30:00Z")),
      ("B", ts("2026-01-01T14:10:00Z"), ts("2026-01-01T14:20:00Z")))
      .toDF("name", "st", "en")
    val points = Seq(
      (1L, ts("2026-01-01T10:30:00Z")), // A start boundary (inclusive)
      (2L, ts("2026-01-01T11:59:00Z")), // A middle, different bin
      (3L, ts("2026-01-01T12:30:00Z")), // A end boundary (inclusive)
      (4L, ts("2026-01-01T13:00:00Z")), // between A and B -> no match
      (5L, ts("2026-01-01T14:15:00Z")), // inside B
      (6L, ts("2026-01-01T09:00:00Z"))) // before everything -> no match
      .toDF("id", "t")

    val out = RangeJoin.binnedIntervalJoin(points, "t", intervals,
      "st", "en")
      .select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "A"), (2L, "A"), (3L, "A"), (5L, "B")))
  }

  test("overlapping intervals both match; no duplicate rows per pair") {
    import spark.implicits._
    val intervals = Seq(
      ("X", ts("2026-01-01T10:00:00Z"), ts("2026-01-01T20:00:00Z")),
      ("Y", ts("2026-01-01T12:00:00Z"), ts("2026-01-01T13:00:00Z")))
      .toDF("name", "st", "en")
    val points = Seq((1L, ts("2026-01-01T12:30:00Z"))).toDF("id", "t")
    val rows = RangeJoin.binnedIntervalJoin(points, "t", intervals,
      "st", "en").select("id", "name").collect()
    assert(rows.length == 2) // X and Y, exactly once each
  }

  test("keys isolate matches (same time range, different key)") {
    import spark.implicits._
    val intervals = Seq(
      (1L, "u1-session", ts("2026-01-01T10:00:00Z"), ts("2026-01-01T11:00:00Z")),
      (2L, "u2-session", ts("2026-01-01T10:00:00Z"), ts("2026-01-01T11:00:00Z")))
      .toDF("user_id", "name", "st", "en")
    val points = Seq((7L, 1L, ts("2026-01-01T10:30:00Z")))
      .toDF("id", "user_id", "t")
    val out = RangeJoin.binnedIntervalJoin(points, "t", intervals,
      "st", "en", keys = Seq("user_id"))
      .select("name").collect().map(_.getString(0)).toSeq
    assert(out == Seq("u1-session"))
  }
}
