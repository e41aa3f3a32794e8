package graft.streaming

import org.apache.spark.sql.functions._

/** Bitwise stream-vs-batch parity for the streaming ANN serving tier:
  * the same query vectors, fed as a stream across micro-batch
  * boundaries, must produce exactly the batch serving tier's rankings
  * (same trained artifacts, same fixed-point ADC arithmetic, same
  * top-k tie-breaks). */
class StreamingAnnServeSpec extends graft.SparkSpec {

  for (nProbe <- Seq(1, 2))
  test(s"streaming IVF-PQ serve matches the batch tier bitwise, nProbe=$nProbe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // batch truth: the s15 serving form, same artifacts, same nProbe
    val want = graft.operators.Similarity
      .ivfPqTopKServe(emb, nProbe = nProbe)
      .select("query_id", "neighbor_id", "adc_fp", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty)
    val (centroids, codebook) =
      graft.operators.Similarity.servingArtifacts(emb)
    val index = graft.operators.Similarity.packedIndex(emb)
    val qvecs = emb.filter(col("vec_id") < 5)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val input = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])]
    val q = StreamingAnnServe.ivfPqTopKStream(
      input.toDF().toDF("query_id", "ts", "emb")
        .withColumn("emb", col("emb").cast("array<float>")),
      centroids, codebook, index, nProbe = nProbe)
      .writeStream.format("memory").queryName(s"ann_serve_$nProbe")
      .outputMode("append").start()
    try {
      // the real queries split across TWO micro-batches, same window
      val (h, rest) = qvecs.splitAt(2)
      input.addData(h.map { case (id, v) =>
        (id, t("2026-01-01T10:00:10Z"), v)
      }.toSeq: _*)
      q.processAllAvailable()
      input.addData(rest.map { case (id, v) =>
        (id, t("2026-01-01T10:00:40Z"), v)
      }.toSeq: _*)
      q.processAllAvailable()
      // two watermark-advancing sentinels: the first batch moves the
      // watermark past the query window's end, the second's batch scans
      // state and emits the closed window (append-mode semantics). The
      // second also closes the FIRST sentinel's window, so sentinel ids
      // are excluded from the comparison below
      input.addData((1000000L, t("2026-01-01T10:05:00Z"), qvecs.head._2))
      q.processAllAvailable()
      input.addData((1000001L, t("2026-01-01T10:06:00Z"), qvecs.head._2))
      q.processAllAvailable()
      val got = spark.table(s"ann_serve_$nProbe")
        .filter(col("query_id") < 1000000L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == want,
        s"stream/batch fork: ${got.size} streamed vs ${want.size} batch; " +
          s"stream-only=${(got -- want).take(5)} " +
          s"batch-only=${(want -- got).take(5)}")
    } finally q.stop()
  }
}
