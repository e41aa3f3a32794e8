package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: attribute each conversion event to the
  * same user's click that happened at most `horizon` before it. Both
  * sides carry watermarks and the join condition bounds the event-time
  * range, so Spark can evict join state for rows that can no longer
  * match — the state-bounded form of stream-stream correlation.
  *
  * Input frames must be streaming DataFrames with columns
  * (user_id, ts, ...); output pairs click and conversion rows. */
object StreamStreamJoin {

  def clickConversionJoin(clicks: DataFrame, conversions: DataFrame,
      watermark: String = "10 minutes",
      horizonMinutes: Int = 30): DataFrame = {
    val c = clicks
      .withWatermark("ts", watermark)
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val v = conversions
      .withWatermark("ts", watermark)
      .select(col("user_id").as("conv_user"), col("ts").as("conv_ts"),
        col("event_id").as("conv_id"))
    v.join(c,
      col("conv_user") === col("click_user") &&
        col("click_ts") <= col("conv_ts") &&
        col("click_ts") >= col("conv_ts") -
          expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col("conv_user").as("user_id"), col("conv_id"),
        col("click_id"), col("click_ts"), col("conv_ts"))
  }
}
