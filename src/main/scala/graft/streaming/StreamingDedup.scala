package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the online face of `Dedup.exactDedup`: documents
  * keyed by content digest, duplicates dropped across micro-batches with
  * watermark-bounded state (`dropDuplicatesWithinWatermark`), so an
  * infinite stream can't grow dedup state without bound. Duplicates
  * arriving within the watermark horizon of the original are suppressed;
  * later re-appearances (beyond state eviction) pass — the standard
  * at-most-once-within-horizon contract. */
object StreamingDedup {

  def dedupStream(documents: DataFrame, eventTimeCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    documents
      .withColumn("content_md5",
        graft.operators.Dedup.contentDigest(col("text")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")
}
