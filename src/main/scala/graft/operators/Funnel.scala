package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the behavioral-analytics
  * staple: how many users completed step 1, then step 2 AFTER step 1,
  * then step 3 after that. "After" is strict event-time order, so a user
  * who purchased before ever clicking does not count as converted.
  *
  * Plan shape (the scalable standard): one key-partitioned aggregate per
  * step, each joined to the survivors of the previous step — every
  * shuffle is keyed by user_id, the survivor frames shrink monotonically
  * by construction, and nothing is per-event stateful. At scale all
  * three aggregations reuse the same hash partitioning on user_id
  * (exchange reuse), so the funnel costs one real shuffle of the events
  * scan plus joins over ever-smaller per-user frames.
  */
object Funnel {

  /** Earliest qualifying timestamp per user for one step: the first
    * `eventType` event strictly after the user's previous-step time
    * (`prev` = survivors of the step before, with their `t` column). */
  private def step(events: DataFrame, eventType: String,
      prev: DataFrame): DataFrame =
    events.filter(col("event_type") === eventType)
      .join(prev.select(col("user_id"), col("t").as("prev_t")), "user_id")
      .filter(col("ts") > col("prev_t"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t"))

  /** w12: the view → click → purchase conversion funnel, one row per
    * stage with the surviving user count. Deterministic: stage times are
    * per-user minima, counts are exact. */
  def conversionFunnel(events: DataFrame): DataFrame = {
    val s1 = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    val s2 = step(events, "click", s1)
    val s3 = step(events, "purchase", s2)
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"),
        col("n_users"))
    stage("step1_view", s1)
      .unionByName(stage("step2_click", s2))
      .unionByName(stage("step3_purchase", s3))
      .orderBy(col("stage"))
  }
}
