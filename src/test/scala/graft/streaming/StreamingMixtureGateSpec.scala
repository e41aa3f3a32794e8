package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream/batch parity of the mixture intake gate: the stateless
  * threshold decision must keep exactly the documents the batch p20
  * manifest counted, and reject untrained sources. */
class StreamingMixtureGateSpec extends SparkSpec {

  test("mixture gate stream keeps exactly the batch p20 selection " +
      "and rejects untrained sources") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val manifest = graft.operators.Sampling.mixtureManifest(docs)
      .collect()
    val thresholds = manifest.map(r => r.getAs[String]("source") ->
      r.getAs[String]("threshold")).toMap
    val expectedKept = manifest.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("n_docs_kept")).toMap
    assert(expectedKept.values.sum > 0 &&
      expectedKept.values.sum < docs.count(),
      "fixture must make the gate both keep and drop")

    val input = MemoryStream[(Long, String, String)]
    val q = StreamingMixtureGate.mixtureGateStream(
      input.toDF().toDF("doc_id", "source", "text"), thresholds)
      .writeStream.format("memory").queryName("mixture_gate")
      .outputMode("append").start()
    try {
      val rows = docs.select("doc_id", "source", "text").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      input.addData(rows.toSeq)
      // an untrained source must be rejected regardless of its draw
      input.addData((424242L, "src_untrained", "x y z"))
      q.processAllAvailable()
      val streamed = spark.table("mixture_gate")
      assert(streamed.filter(col("source") === "src_untrained").count()
        == 0L)
      val bySource = streamed.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((src, n) <- expectedKept)
        assert(bySource.getOrElse(src, 0L) == n,
          s"$src: streamed ${bySource.getOrElse(src, 0L)} vs batch $n")
      // the decision is a deterministic draw: re-feeding the same rows
      // through a fresh gate selects the SAME ids (restart-stable)
      val ids1 = streamed.select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val batchKept = StreamingMixtureGate.mixtureGateStream(
        docs.select("doc_id", "source", "text"), thresholds)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids1 == batchKept)
    } finally q.stop()
  }
}
