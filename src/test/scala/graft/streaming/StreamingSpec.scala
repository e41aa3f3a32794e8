package graft.streaming

import java.nio.file.Files
import java.time.LocalDateTime

import graft.SparkSpec
import graft.lake.{InMemoryLakeStorage, MarkerSplit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming behavior: watermarked windowed aggregation,
  * custom sessionization state, and foreachBatch lake ingest — each driven
  * through a MemoryStream micro-batch by micro-batch. */
class StreamingSpec extends SparkSpec {

  private def micros(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli * 1000L

  test("windowed counts over a stream finalize per event-time hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventTimeOps.windowedCountsStream(events, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete") // complete: emit all windows each trigger
      .start()
    try {
      def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      input.addData(
        (t("2026-01-01T10:05:00Z"), "click", 1.0),
        (t("2026-01-01T10:55:00Z"), "click", 2.0),
        (t("2026-01-01T11:05:00Z"), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(date_format(col("wstart"), "HH").as("h"), col("event_type"),
          col("n_events"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(rows == Set(("10", "click", 2L, 3.0), ("11", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("sliding windows assign every event to exactly len/slide windows") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val events = Seq(
      (t("2026-01-01T10:03:00Z"), "click", 1.0),
      (t("2026-01-01T10:07:00Z"), "click", 2.0),
      (t("2026-01-01T10:12:00Z"), "view", 4.0))
      .toDF("ts", "event_type", "value")
    val out = EventTimeOps.slidingCounts(events).collect()
    // 10min/5min overlap factor 2: total window-event memberships = 2N
    assert(out.map(_.getAs[Long]("n_events")).sum == 2 * events.count())
    // 10:03 lands in [09:55,10:05) and [10:00,10:10); 10:07 in [10:00,
    // 10:10) and [10:05,10:15) -> the shared [10:00,10:10) click window
    // holds both
    val shared = out.find(r =>
      r.getAs[java.sql.Timestamp]("wstart").toInstant ==
        java.time.Instant.parse("2026-01-01T10:00:00Z") &&
        r.getString(2) == "click").get
    assert(shared.getAs[Long]("n_events") == 2L
      && shared.getAs[Double]("sum_value") == 3.0)
  }

  test("sliding windows over a stream match the batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventTimeOps.windowedCountsStream(events, "10 minutes",
      "10 minutes", slide = Some("5 minutes"))
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete")
      .start()
    try {
      def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      val batch = Seq(
        (t("2026-01-01T10:03:00Z"), "click", 1.0),
        (t("2026-01-01T10:07:00Z"), "click", 2.0),
        (t("2026-01-01T10:12:00Z"), "view", 4.0))
      input.addData(batch: _*)
      q.processAllAvailable()
      val stream = spark.table("slide_counts")
        .select(col("wstart"), col("event_type"), col("n_events"),
          col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batchSide = EventTimeOps
        .slidingCounts(batch.toDF("ts", "event_type", "value"))
        .select(col("wstart"), col("event_type"), col("n_events"),
          col("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(stream == batchSide)
    } finally q.stop()
  }

  test("sessionizer emits closed sessions across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val t0 = micros("2026-01-01T10:00:00Z")
      val min = 60L * 1000000
      // batch 1: two close events -> one open session, nothing emitted
      input.addData(SessionEvent(1, 1, t0), SessionEvent(1, 2, t0 + 5 * min))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0)
      // batch 2: 2h later -> gap closes session 1 (2 events), emits it
      input.addData(SessionEvent(1, 3, t0 + 125 * min))
      q.processAllAvailable()
      val s = spark.table("sessions").as[ClosedSession].collect().toSeq
      assert(s == Seq(ClosedSession(1, t0, t0 + 5 * min, 2)))
    } finally q.stop()
  }

  test("event-time timeout flushes an idle user's open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // the timeout clock is the WATERMARK over the event-time column
    val withWm = input.toDS()
      .withColumn("ets", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.col("tsMicros")))
      .withWatermark("ets", "0 seconds")
      .as[SessionEvent]
    val q = Sessionizer.sessionizeWithTimeout(withWm)
      .writeStream.format("memory").queryName("timeout_sessions")
      .outputMode("append").start()
    try {
      val t0 = micros("2026-01-01T10:00:00Z")
      val min = 60L * 1000000
      // user 1's session: 2 events, then silence forever
      input.addData(SessionEvent(1, 1, t0), SessionEvent(1, 2, t0 + 5 * min))
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").count() == 0)
      // an unrelated user's events advance the watermark past user 1's
      // gap horizon (t0+35min); the next trigger fires the timeout
      input.addData(SessionEvent(2, 3, t0 + 120 * min))
      q.processAllAvailable()
      input.addData(SessionEvent(2, 4, t0 + 121 * min))
      q.processAllAvailable()
      val got = spark.table("timeout_sessions").as[ClosedSession]
        .collect().toSet
      assert(got.contains(ClosedSession(1, t0, t0 + 5 * min, 2)),
        s"idle user 1's session should have been flushed by timeout: $got")
      // user 2 stayed active within its gap: still open, not emitted
      assert(!got.exists(_.user_id == 2))
    } finally q.stop()
  }

  test("batch and streaming sessionization agree on closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = micros("2026-01-01T08:00:00Z")
    val min = 60L * 1000000
    val evs = Seq(
      SessionEvent(1, 1, t0), SessionEvent(1, 2, t0 + 10 * min),
      SessionEvent(1, 3, t0 + 90 * min), // new session (80m gap)
      SessionEvent(2, 4, t0 + 5 * min),
      SessionEvent(2, 5, t0 + 200 * min)) // new session

    // batch formulation over the same data
    val batchDf = evs.toDF()
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tsMicros")).as("ts"))
    val batch = EventTimeOps.sessionizeBatch(batchDf, 30)
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    // streaming: one batch per event so every gap closes across triggers
    val input = MemoryStream[SessionEvent]
    val q = Sessionizer.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode("append").start()
    try {
      evs.foreach { e => input.addData(e); q.processAllAvailable() }
      val streamed = spark.table("sessions_parity").as[ClosedSession]
        .collect()
        .map(s => (s.user_id, s.session_start, s.session_end,
          s.n_events.toLong)).toSet
      // streaming emits only CLOSED sessions; the final session per user
      // stays open in state -> batch result minus per-user last sessions
      val lastPerUser = batch.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).values.toSet
      assert(streamed == batch -- lastPerUser)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("timeout sessionizer reaches FULL bitwise parity with batch") {
    // The append-mode sessionizer can only emit a user's last session via
    // the event-time timeout, so this is the one path where stream and
    // batch can agree on the COMPLETE result: replay the fixture one
    // event per trigger (deterministic watermark march), then advance the
    // watermark far past every gap horizon with a sentinel user and
    // assert exact equality of every (user, start, end, n) long tuple —
    // a Spark upgrade that forks the two paths fails this bitwise.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = micros("2026-01-01T08:00:00Z")
    val min = 60L * 1000000
    val evs = Seq(
      SessionEvent(1, 1, t0), SessionEvent(2, 4, t0 + 5 * min),
      SessionEvent(1, 2, t0 + 10 * min),
      SessionEvent(1, 3, t0 + 90 * min), // u1: new session (80m gap)
      SessionEvent(2, 5, t0 + 200 * min)) // u2: new session

    val batchDf = evs.toDF()
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tsMicros")).as("ts"))
    val batch = EventTimeOps.sessionizeBatch(batchDf, 30)
      .select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val input = MemoryStream[SessionEvent]
    val withWm = input.toDS()
      .withColumn("ets", timestamp_micros(col("tsMicros")))
      .withWatermark("ets", "0 seconds")
      .as[SessionEvent]
    val q = Sessionizer.sessionizeWithTimeout(withWm)
      .writeStream.format("memory").queryName("sessions_parity_full")
      .outputMode("append").start()
    try {
      evs.foreach { e => input.addData(e); q.processAllAvailable() }
      // sentinel advances the watermark past every open horizon; the
      // second trigger fires the armed timeouts against it
      input.addData(SessionEvent(99, 98, t0 + 100000 * min))
      q.processAllAvailable()
      input.addData(SessionEvent(99, 99, t0 + 100001 * min))
      q.processAllAvailable()
      val streamed = spark.table("sessions_parity_full").as[ClosedSession]
        .collect()
        .filter(_.user_id != 99)
        .map(s => (s.user_id, s.session_start, s.session_end,
          s.n_events.toLong)).toSet
      assert(streamed == batch,
        s"stream/batch fork: stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("a late straggler is dropped as late data and cannot kill the " +
    "timeout sessionizer") {
    // Spark's FlatMapGroupsWithStateExec filters input rows older than
    // the watermark when EventTimeTimeout is armed, so a straggler whose
    // session_end + gap is already behind the watermark never reaches the
    // state function (verified here: no user-3 session is ever emitted).
    // The watermark clamp in sessionizeWithTimeout is insurance for an
    // engine that delivers such a row anyway — an unclamped
    // setTimeoutTimestamp at or before the watermark throws
    // IllegalArgumentException and kills the whole query. Either way the
    // invariant under test is: a late row must not crash the stream, and
    // in-watermark sessions keep flushing normally after it.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = micros("2026-01-01T08:00:00Z")
    val min = 60L * 1000000
    val input = MemoryStream[SessionEvent]
    val withWm = input.toDS()
      .withColumn("ets", timestamp_micros(col("tsMicros")))
      .withWatermark("ets", "0 seconds")
      .as[SessionEvent]
    val q = Sessionizer.sessionizeWithTimeout(withWm)
      .writeStream.format("memory").queryName("late_straggler")
      .outputMode("append").start()
    try {
      // march the watermark far ahead of the straggler
      input.addData(SessionEvent(9, 1, t0 + 1000 * min))
      q.processAllAvailable()
      // straggler: horizon t0+30min << watermark — must not throw
      input.addData(SessionEvent(3, 2, t0))
      q.processAllAvailable()
      // user 9 goes idle; a sentinel marches the watermark past its gap
      // horizon and the following trigger fires the armed timeout
      input.addData(SessionEvent(8, 3, t0 + 2000 * min))
      q.processAllAvailable()
      input.addData(SessionEvent(8, 4, t0 + 3000 * min))
      q.processAllAvailable()
      val got = spark.table("late_straggler").as[ClosedSession]
        .collect().toSet
      assert(!got.exists(_.user_id == 3),
        s"late straggler should have been dropped, not sessionized: $got")
      assert(got.contains(
        ClosedSession(9, t0 + 1000 * min, t0 + 1000 * min, 1)),
        s"idle session should still flush after the straggler: $got")
    } finally q.stop()
  }

  test("foreachBatch streaming ingest lands split books in the lake") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val The = MarkerSplit.StartMarkers(0)
    val EndThe = MarkerSplit.EndMarkers(0)
    val storage = new InMemoryLakeStorage(spark)
    val ckpt = Files.createTempDirectory("graft-ckpt-").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String)]
    val q = StreamingIngest.start(
      input.toDF().toDF("book_id", "text"), storage, ckpt,
      () => LocalDateTime.of(2026, 2, 2, 14, 0))
    try {
      input.addData(
        (10L, s"intro\n$The ***\nten\n$EndThe ***"),
        (11L, "no markers -> skipped"))
      q.processAllAvailable()
      input.addData((12L, s"intro\n$The ***\ntwelve\n$EndThe ***"))
      q.processAllAvailable()
      assert(storage.listBooks() == Seq(10L, 12L))
      assert(!storage.exists(11L))
    } finally q.stop()
  }
}

/** Watermark-bounded streaming dedup. */
class StreamingDedupSpec extends graft.SparkSpec {
  test("duplicates across micro-batches are dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingDedup.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
      input.addData(
        (t("2026-01-01T10:00:00Z"), 1L, "the same doc"),
        (t("2026-01-01T10:00:10Z"), 2L, "the  same   doc"), // ws-normalized dup
        (t("2026-01-01T10:00:20Z"), 3L, "a different doc"))
      q.processAllAvailable()
      // duplicate re-arrives in a later micro-batch, still within watermark
      input.addData((t("2026-01-01T10:05:00Z"), 4L, "the same doc"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("deterministic replay reaches FULL parity with batch exact dedup " +
      "(d01's operator)") {
    // closes the chain stream = batch = DuckDB: d01 (exactDedup over the
    // doubled corpus) is oracle-green, so bitwise stream-vs-batch parity
    // here transitively pins the stream to the DuckDB oracle. Replay is
    // deterministic: originals in micro-batch 1 (each digest unique — a
    // guarded precondition, otherwise which copy survives within a batch
    // is partition order), their byte-identical +1000000 copies in
    // micro-batch 2, every arrival inside the 1h watermark horizon. The
    // stream must keep exactly the batch side's kept (id, digest) pairs:
    // same digest function (Dedup.contentDigest is the single source of
    // truth), same keep-lowest-id rule realized as keep-first-arrival.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = graft.operators.Dedup.doubledCorpus(docs)
    val batch = graft.operators.Dedup.exactDedup(corpus)
      .select("kept_doc_id", "content_md5", "n_copies").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val rows = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (originals, copies) = rows.partition(_._1 < 1000000L)
    // precondition for a deterministic replay (see above)
    assert(batch.length == originals.length && batch.forall(_._3 == 2L),
      "fixture gained intra-original duplicates; replay order matters now")

    val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z").toEpochMilli
    def at(i: Int) = new java.sql.Timestamp(t0 + i * 10L)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingDedup.dedupStream(
      input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_parity")
      .outputMode("append").start()
    try {
      input.addData(originals.zipWithIndex.map {
        case ((id, tx), i) => (at(i), id, tx)
      }.toSeq: _*)
      q.processAllAvailable()
      input.addData(copies.zipWithIndex.map {
        case ((id, tx), i) => (at(originals.length + i), id, tx)
      }.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("dedup_parity")
        .select(col("doc_id"), col("content_md5")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch.map { case (id, d, _) => (id, d) }.toSet,
        s"stream/batch fork: ${streamed.size} streamed vs " +
          s"${batch.length} batch-kept")
    } finally q.stop()
  }
}

/** Watermarked stream-stream interval join. */
class StreamStreamJoinSpec extends graft.SparkSpec {
  test("conversions join clicks within the horizon, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val clicks = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val convs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = StreamStreamJoin.clickConversionJoin(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      convs.toDF().toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("attributions")
      .outputMode("append").start()
    try {
      // batch 1: two clicks for user 1, one ancient click for user 2
      clicks.addData(
        (1L, t("2026-01-01T10:00:00Z"), 100L),
        (1L, t("2026-01-01T10:20:00Z"), 101L),
        (2L, t("2026-01-01T08:00:00Z"), 102L))
      q.processAllAvailable()
      // batch 2: conversions arrive later
      convs.addData(
        (1L, t("2026-01-01T10:25:00Z"), 200L), // within 30m of both clicks
        (2L, t("2026-01-01T10:25:00Z"), 201L)) // click 102 is 2h25m old
      q.processAllAvailable()
      val rows = spark.table("attributions")
        .select("conv_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((200L, 100L), (200L, 101L)))
    } finally q.stop()
  }

  test("streaming cell assignment matches the batch quantizer exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids =
      graft.operators.Clustering.trainedCentroidsLocal(emb, k = 4)
    // batch truth: the same argmin via Clustering.assign
    val vectors = emb.select(col("vec_id"), col("embedding").as("emb"))
      .withColumn("vnorm2",
        graft.functions.VectorOps.dot(col("emb"), col("emb")))
    val want = graft.operators.Clustering.assign(vectors, centroids)
      .select("vec_id", "cluster_id", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamEnrich.assignCellsStream(
      input.toDF().toDF("vec_id", "emb")
        .withColumn("emb", col("emb").cast("array<float>")), centroids)
      .writeStream.format("memory").queryName("cells")
      .outputMode("append").start()
    try {
      val (h, t) = rows.splitAt(rows.length / 2)
      input.addData(h.toSeq); q.processAllAvailable() // two micro-batches
      input.addData(t.toSeq); q.processAllAvailable()
      val got = spark.table("cells").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want) // bitwise: same arithmetic, same tie-break
    } finally q.stop()
  }

  test("stream-static enrichment joins each batch against the broadcast dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val users = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val input = MemoryStream[(Long, Long)]
    val q = StreamEnrich.enrichEvents(
      input.toDF().toDF("user_id", "event_id"), users)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData((1L, 10L), (3L, 30L)) // user 3 unknown -> dropped
      q.processAllAvailable()
      input.addData((2L, 20L))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .select("event_id", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows == Set((10L, "gold"), (20L, "free")))
    } finally q.stop()
  }

  test("streaming transitions match the batch lag window across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TypedEvent]
    val q = StreamingTransitions.transitions(input.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      val t0 = java.time.Instant.parse("2026-01-01T10:00:00Z")
        .toEpochMilli * 1000L
      // batch 1: user 1 a->b, user 2 starts with x (no edge yet)
      input.addData(TypedEvent(1, 1, t0, "a"), TypedEvent(1, 2, t0 + 1, "b"),
        TypedEvent(2, 3, t0 + 2, "x"))
      q.processAllAvailable()
      // batch 2: the cross-batch edges b->c and x->y come FROM STATE
      input.addData(TypedEvent(1, 4, t0 + 3, "c"),
        TypedEvent(2, 5, t0 + 4, "y"))
      q.processAllAvailable()
      val got = spark.table("transitions").as[Transition].collect()
        .map(t => (t.user_id, t.src, t.dst)).toSet
      assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (2L, "x", "y")))

      // parity: the same events through the batch operator's step
      // extraction (lag window) give the same multiset of edges
      val batch = Seq((1L, 1L, t0, "a"), (1L, 2L, t0 + 1, "b"),
        (2L, 3L, t0 + 2, "x"), (1L, 4L, t0 + 3, "c"), (2L, 5L, t0 + 4, "y"))
        .map { case (u, e, ts, et) =>
          (u, e, new java.sql.Timestamp(ts / 1000), et)
        }.toDF("user_id", "event_id", "ts", "event_type")
      val counts = graft.operators.Graph.transitionCounts(batch)
        .select("src", "dst", "n").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val streamCounts = got.toSeq.groupBy(t => (t._2, t._3))
        .view.mapValues(_.size.toLong).toMap
      assert(streamCounts == counts)
    } finally q.stop()
  }
}

/** Streaming corpus intake: the stream's kept set must equal the batch
  * composition of the same stages (quality gate ∘ decontamination ∘
  * corpus-index dedup), with in-stream duplicates dropped. */
class StreamingCorpusGateSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("corpus gate stream matches the batch stage composition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val benchPred = col("doc_id") % 100 === 0
    // benchmark shingle set (exact postings — the p02 contract)
    val benchShingles = graft.operators.Dedup.shinglePostings(
      docs.filter(benchPred).select(col("doc_id"), col("text")), 3, None)
      .select("shingle").distinct().collect().map(_.getString(0)).toSeq
    assert(benchShingles.nonEmpty)
    // two documents already landed in the corpus index
    val landedIds = Set(1L, 3L)
    val digestIndex = docs.filter(col("doc_id").isin(landedIds.toSeq: _*))
      .select(graft.operators.Dedup.contentDigest(col("text"))
        .as("content_md5"))
    // batch reference over the train side, stage by stage
    val train = docs.filter(!benchPred)
    val passQ = graft.operators.TextAnalysis.qualityScore(train)
      .filter(col("quality") >= 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val contaminated = graft.operators.TextAnalysis.contaminationScores(
      docs, benchPred).collect().map(_.getAs[Long]("doc_id")).toSet
    val expected = passQ -- contaminated -- landedIds
    assert(expected.nonEmpty && contaminated.nonEmpty,
      "fixture must exercise every stage")

    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = graft.streaming.StreamingCorpusGate.corpusGateStream(
      input.toDF().toDF("ts", "doc_id", "text"), digestIndex,
      benchShingles)
      .writeStream.format("memory").queryName("corpus_gate")
      .outputMode("append").start()
    try {
      def t(off: Int) = java.sql.Timestamp.from(
        java.time.Instant.parse("2026-01-01T10:00:00Z").plusSeconds(off))
      val rows = train.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      input.addData(rows.zipWithIndex.map { case ((id, tx), i) =>
        (t(i), id, tx) }.toSeq)
      q.processAllAvailable()
      // a byte-identical dup of a surviving doc arrives later — the
      // in-stream watermark dedup must drop it
      val survivorText = rows.find(r => expected(r._1)).get._2
      input.addData((t(rows.length + 1), 999999L, survivorText))
      q.processAllAvailable()
      val streamed = spark.table("corpus_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == expected,
        s"missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }

  test("requireGopher gate matches the batch t35 keep set in-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // batch reference: t35 keep ∩ quality gate (no bench/dedup stages:
    // empty bench set and empty index isolate the gopher stage)
    val gopherKeep = graft.operators.TextAnalysis.gopherRules(docs)
      .filter(col("keep")).collect().map(_.getAs[Long]("doc_id")).toSet
    val passQ = graft.operators.TextAnalysis.qualityScore(docs)
      .filter(col("quality") >= 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val expected = gopherKeep intersect passQ
    assert(expected.nonEmpty && (passQ -- gopherKeep).nonEmpty,
      "fixture must have docs the gopher gate uniquely rejects")
    val emptyIndex = Seq.empty[String].toDF("content_md5")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = graft.streaming.StreamingCorpusGate.corpusGateStream(
      input.toDF().toDF("ts", "doc_id", "text"), emptyIndex,
      // a shingle no document can contain (empty Seq would make the
      // literal array untyped) — isolates the gopher stage
      benchShingles = Seq("     "), requireGopher = true)
      .writeStream.format("memory").queryName("gopher_gate")
      .outputMode("append").start()
    try {
      def t(off: Int) = java.sql.Timestamp.from(
        java.time.Instant.parse("2026-01-01T10:00:00Z").plusSeconds(off))
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      input.addData(rows.zipWithIndex.map { case ((id, tx), i) =>
        (t(i), id, tx) }.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("gopher_gate").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == expected,
        s"missing=${expected -- streamed} extra=${streamed -- expected}")
    } finally q.stop()
  }
}

/** w20's stream twin: bitwise stream-vs-batch parity of OHLC bars
  * across micro-batch boundaries (selection-only aggregates — equality
  * is exact, not tolerance). */
class StreamingOhlcSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("streaming OHLC bars reach bitwise parity with w20's batch form") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val fix = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "event_type", "value")
    val rows = fix.collect().map(r => (r.getAs[Long]("event_id"),
      r.getAs[java.sql.Timestamp]("ts"), r.getAs[String]("event_type"),
      r.getAs[Double]("value"))).sortBy(_._2.getTime)
    val batch = graft.operators.Windows.ohlcBars(fix).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("hour").getTime,
        r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"),
        r.getAs[Long]("n_events"))).toSet

    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val q = graft.streaming.EventTimeOps.ohlcBarsStream(
      input.toDF().toDF("event_id", "ts", "event_type", "value"))
      .writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("append").start()
    try {
      // feed in three event-time-ordered micro-batches, then a far-
      // future flush event so the watermark closes every fixture window
      val thirds = rows.grouped(math.max(1, rows.length / 3 + 1)).toSeq
      thirds.foreach { g => input.addData(g.toSeq); q.processAllAvailable() }
      val flushTs = java.sql.Timestamp.from(
        rows.last._2.toInstant.plusSeconds(14 * 24 * 3600))
      input.addData((999999L, flushTs, "flush", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ohlc_stream")
        .filter(col("event_type") =!= "flush").collect()
        .map(r => (r.getAs[String]("event_type"),
          r.getAs[java.sql.Timestamp]("hour").getTime,
          r.getAs[Double]("open"), r.getAs[Double]("high"),
          r.getAs[Double]("low"), r.getAs[Double]("close"),
          r.getAs[Long]("n_events"))).toSet
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
    } finally q.stop()
  }
}
