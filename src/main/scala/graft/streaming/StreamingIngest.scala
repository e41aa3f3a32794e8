package graft.streaming

import java.time.LocalDateTime

import graft.lake.{LakeStorage, MarkerSplit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming face of the ingest pipeline (SURVEY §2.9): a stream of
  * (book_id, text) documents → marker split → partitioned lake append,
  * per micro-batch via `foreachBatch`. Each batch lands in the
  * time-partition of its processing time — exactly the reference's
  * `LocalDateTime.now()` ingestion-time bucketing (Main.java:105), with
  * the clock injectable for tests. */
object StreamingIngest {

  def start(documents: DataFrame, storage: LakeStorage, checkpointDir: String,
      clock: () => LocalDateTime = () => LocalDateTime.now()): StreamingQuery =
    documents.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val split = MarkerSplit.withSplit(batch)
        storage.saveBooks(
          split.filter(col("split_ok"))
            .select(col("book_id"), col("header"), col("body")),
          clock())
      }
      .start()
}
