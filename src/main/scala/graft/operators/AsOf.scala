package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no builtin for,
  * composed from existing ops per the preference order (SURVEY §7): no
  * custom strategy needed.
  *
  * Formulation: union-tag the tick and probe streams, one shuffle on the
  * key, one sort by (time, tick-first), then `last(_, ignoreNulls)` over
  * the running frame carries the latest tick payload forward onto every
  * probe row. This is the sort-merge as-of: cost = one exchange + one
  * sort regardless of tick/probe ratio — no per-probe subquery, no range
  * cross-join blowup, skew handled by AQE like any other shuffle.
  *
  * Contract: ticks must be unique per (key, time) — pre-aggregate them
  * otherwise (ties would make "the" latest tick nondeterministic; the
  * DuckDB ASOF JOIN oracle has the same requirement).
  */
object AsOf {

  /** For each probe row, attach the latest tick (as a struct `tick`) with
    * tick time <= probe time, per key. Probes with no prior tick get a
    * null `tick` (left semantics). Time columns may be named differently
    * per side but must be mutually comparable (same type). */
  def asOfJoin(probes: DataFrame, ticks: DataFrame, key: String,
      probeTime: String, tickTime: String): DataFrame = {
    val tickPayload = struct(ticks.columns.toIndexedSeq.map(col): _*)
    val t = ticks.select(col(key).as("_k"), col(tickTime).as("_t"),
      lit(1).as("_is_tick"), tickPayload.as("_tick"))
    val probePayload = struct(probes.columns.toIndexedSeq.map(col): _*)
    val p = probes.select(col(key).as("_k"), col(probeTime).as("_t"),
      lit(0).as("_is_tick"), probePayload.as("_probe"))

    val u = t.withColumn("_probe", lit(null).cast(p.schema("_probe").dataType))
      .unionByName(p.withColumn("_tick",
        lit(null).cast(t.schema("_tick").dataType)))

    // ticks sort before probes at equal time => "at or before" inclusive
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_is_tick").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    u.withColumn("tick", last(col("_tick"), ignoreNulls = true).over(w))
      .filter(col("_probe").isNotNull)
      .select(col("_probe.*"), col("tick"))
  }

  /** Oracle-checked instantiation: attribute every event to its user's
    * most recent order at or before the event time. Orders are collapsed
    * to one tick per (custkey, orderdate) — max orderkey + that-day count
    * — to satisfy the uniqueness contract. */
  def eventOrderAttribution(events: DataFrame, orders: DataFrame): DataFrame = {
    val ticks = orders
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_orderkey"),
        count(lit(1)).as("n_orders_that_day"))
    val probes = events.select(col("event_id"), col("user_id"), col("ts"))
    asOfJoin(probes, ticks, "user_id", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"),
        col("tick.last_orderkey").as("last_orderkey"),
        date_format(col("tick.o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("tick.n_orders_that_day").as("n_orders_that_day"))
      .orderBy(col("event_id"))
  }
}
