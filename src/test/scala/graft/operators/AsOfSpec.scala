package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics: at-or-before inclusivity, left behavior for
  * probes with no prior tick, per-key isolation. */
class AsOfSpec extends SparkSpec {

  test("attaches the latest tick at or before each probe, per key") {
    import spark.implicits._
    val ticks = Seq(
      (1L, 10L, "t1@10"), (1L, 20L, "t1@20"),
      (2L, 15L, "t2@15"))
      .toDF("k", "t", "tick_name")
    val probes = Seq(
      (1L, 5L, "p_before_any"), // before all ticks -> null
      (1L, 10L, "p_tie"), // tie with tick@10 -> inclusive
      (1L, 19L, "p_mid"), // between ticks -> tick@10
      (1L, 99L, "p_late"), // after all -> tick@20
      (2L, 16L, "p_other_key"), // key 2 -> its own tick, not key 1's
      (3L, 50L, "p_no_ticks")) // key with no ticks at all -> null
      .toDF("k", "t", "probe_name")

    val out = AsOf.asOfJoin(probes, ticks, "k", "t", "t")
      .select(col("probe_name"), col("tick.tick_name"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap

    assert(out == Map(
      "p_before_any" -> None,
      "p_tie" -> Some("t1@10"),
      "p_mid" -> Some("t1@10"),
      "p_late" -> Some("t1@20"),
      "p_other_key" -> Some("t2@15"),
      "p_no_ticks" -> None))
  }

  test("probe count is preserved (left semantics, no fan-out)") {
    import spark.implicits._
    val ticks = Seq((1L, 10L, "a"), (1L, 10L, "b")) // duplicate tick time!
      .toDF("k", "t", "v")
    val dedupedTicks = ticks.groupBy("k", "t").agg(max("v").as("v"))
    val probes = (1L to 100L).map(i => (1L, i)).toDF("k", "t")
    val out = AsOf.asOfJoin(probes, dedupedTicks, "k", "t", "t")
    assert(out.count() == 100)
  }
}
