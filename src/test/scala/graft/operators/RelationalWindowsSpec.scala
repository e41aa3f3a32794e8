package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Targeted semantics of the relational/window layers that the oracles
  * can't distinguish on the (non-null, tie-free) fixtures. */
class RelationalWindowsSpec extends SparkSpec {

  test("davg matches SQL AVG on nullable columns (ADVICE r01 regression)") {
    import spark.implicits._
    val df = Seq(Some(10.0), None, Some(20.0)).toDF("x")
    val r = df.agg(Relational.davg(col("x")).as("a"),
      avg(col("x")).as("ref")).head()
    assert(r.getDouble(0) == 15.0 && r.getDouble(1) == 15.0)
  }

  test("dsum is exact where double summation would drift") {
    import spark.implicits._
    // 0.1 summed 1000x: double fold drifts, decimal sum is exactly 100
    val df = (1 to 1000).map(_ => 0.1).toDF("x")
    assert(df.agg(Relational.dsum(col("x"))).head().getDouble(0) == 100.0)
  }

  test("topKOrders breaks price ties by order key") {
    import spark.implicits._
    val orders = Seq((3L, 1L, 500.0), (1L, 1L, 500.0), (2L, 1L, 400.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val keys = Relational.topKOrders(orders, 2).collect().map(_.getLong(0))
    assert(keys.toSeq == Seq(1L, 3L))
  }

  test("customerOrderStats keeps order-less customers with zero totals") {
    import spark.implicits._
    val cust = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val ords = Seq((10L, 1L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val rows = Relational.customerOrderStats(cust, ords).collect()
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Long]("order_count") == 0L)
    assert(r2.getAs[Double]("total_spent") == 0.0)
  }

  test("distribution percentiles are bitwise the buffering exact form") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val a = li.groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, 0.25)").as("qty_p25"),
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_quantity, 0.75)").as("qty_p75"))
      .orderBy(col("l_returnflag")).collect().map(_.toSeq).toSeq
    val b = Relational.percentilesByDistribution(li)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("orderStatusPivot is total: rows with absent combos pivot to 0") {
    import spark.implicits._
    val orders = Seq(("1-URGENT", "F"), ("1-URGENT", "F"), ("2-HIGH", "O"))
      .toDF("o_orderpriority", "o_orderstatus")
    val rows = Relational.orderStatusPivot(orders).collect()
    val urgent = rows.find(_.getString(0) == "1-URGENT").get
    assert(urgent.getAs[Long]("n_f") == 2L && urgent.getAs[Long]("n_o") == 0L)
    // every input row lands in exactly one cell
    assert(rows.map(r => r.getAs[Long]("n_f") + r.getAs[Long]("n_o")
      + r.getAs[Long]("n_p")).sum == orders.count())
  }

  test("bigramRarity: rare fractions bounded, singleton corpus all-rare") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.bigramRarity(docs).collect()
    rows.foreach { r =>
      val f = r.getAs[Double]("rare_frac")
      assert(f >= 0.0 && f <= 1.0 && r.getAs[Long]("min_df") >= 1L)
    }
    // doc 1's "beta gamma" occurs once corpus-wide -> rare; "alpha beta"
    // occurs 3x (once here, twice in doc 2) -> not rare at rareMax=2
    val d1 = rows.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_bigrams") == 2L)
    assert(d1.getAs[Double]("rare_frac") == 0.5)
    assert(d1.getAs[Double]("mean_df") == 2.0) // (3 + 1) / 2
  }

  test("sessionGaps is exact to the microsecond (sub-second timestamps)") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.2"), 1L),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.9"), 1L))
      .toDF("event_id", "ts", "user_id")
    val gaps = Windows.sessionGaps(df).collect()
      .map(r => Option(r.get(4)).map(_.asInstanceOf[Long]))
    // floor-to-second arithmetic would give 0; exact micros give 700000
    assert(gaps.toSeq == Seq(None, Some(700000L)))
  }

  test("setOps partitions custkeys into both/only sets disjointly") {
    import spark.implicits._
    val orders = Seq(
      (1L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00")))
      .toDF("o_custkey", "o_orderdate")
    val out = Relational.setOps(orders).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("both", 1L), ("only_1995", 2L), ("only_2000", 3L)))
  }

  test("setOpsAll preserves multiplicity (bag semantics)") {
    import spark.implicits._
    // cust 1: 3 orders in 1995, 1 in 2000 -> both x1, only_1995 x2
    val orders = Seq(
      (1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("1995-02-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("1995-03-01 00:00:00")),
      (2L, java.sql.Timestamp.valueOf("1995-06-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00")),
      (3L, java.sql.Timestamp.valueOf("2000-06-01 00:00:00")))
      .toDF("o_custkey", "o_orderdate")
    val out = Relational.setOpsAll(orders).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("both", 1L), ("only_1995", 1L), ("only_1995", 1L),
      ("only_1995", 2L), ("only_2000", 3L)))
  }

  test("rollingActiveUsers counts each user once per trailing window") {
    import spark.implicits._
    // hours 0,1,2: user 1 active at h0 and h2 (twice), user 2 at h1
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:10:00")),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 01:30:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 02:05:00")),
      (1L, java.sql.Timestamp.valueOf("2026-01-01 02:40:00")))
      .toDF("user_id", "ts")
    val out = Windows.rollingActiveUsers(events).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq
    assert(out == Seq(
      ("2026-01-01 00:00:00.0", 1L),   // {1}
      ("2026-01-01 01:00:00.0", 2L),   // {1,2}: user 1 via h0
      ("2026-01-01 02:00:00.0", 2L)))  // {1,2}: both within 3h, 1 counted once
  }

  test("open shipments: the array fold prefix-sums interval deltas") {
    import spark.implicits._
    // transit is orderkey%30+1 days: ok=30 -> 1 day, ok=1 -> 2 days.
    // Both ship on day 0: open {2, 1, 0} over days 0,1,2 — and day 2
    // (all closed) must still appear with an explicit 0
    val li = Seq(
      (30L, java.sql.Timestamp.valueOf("2026-04-01 08:00:00")),
      (1L, java.sql.Timestamp.valueOf("2026-04-01 17:30:00")))
      .toDF("l_orderkey", "l_shipdate")
    val got = Windows.openShipments(li).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    assert(got == Seq(("2026-04-01", 2L), ("2026-04-02", 1L),
      ("2026-04-03", 0L)))
  }

  test("time-of-week profile buckets with Monday=0 weekdays") {
    import spark.implicits._
    // 2024-01-01 is a Monday; 2024-01-07 a Sunday
    val events = Seq("2024-01-01 09:15:00", "2024-01-01 09:45:00",
      "2024-01-07 23:05:00")
      .map(s => Tuple1(java.sql.Timestamp.valueOf(s))).toDF("ts")
    val got = Windows.timeOfWeekProfile(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 9L) -> 2L, (6L, 23L) -> 1L))
  }

  test("streaks collapse consecutive days into islands per user") {
    import spark.implicits._
    // user 1: Jan 1-3 (streak 3), Jan 5-6 (streak 2); user 2: Jan 10
    val events = Seq((1L, "2024-01-01"), (1L, "2024-01-02"),
      (1L, "2024-01-02"), (1L, "2024-01-03"), (1L, "2024-01-05"),
      (1L, "2024-01-06"), (2L, "2024-01-10"))
      .zipWithIndex.map { case ((u, d), i) =>
        (u, i.toLong, java.sql.Timestamp.valueOf(s"$d 12:00:00")) }
      .toDF("user_id", "event_id", "ts")
    val got = Windows.activityStreaks(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("longest_streak"),
          r.getAs[java.sql.Date]("streak_start").toString,
          r.getAs[Long]("n_streaks"))).toMap
    assert(got == Map(
      1L -> ((3L, "2024-01-01", 2L)),
      2L -> ((1L, "2024-01-10", 1L))))
  }

  test("ewma weights the trailing window by powers of two, renormalized") {
    import spark.implicits._
    val events = Seq((1L, 1L, "2024-01-01 00:00:01", 1.0),
      (1L, 2L, "2024-01-01 00:00:02", 3.0))
      .map { case (u, e, ts, v) =>
        (u, e, java.sql.Timestamp.valueOf(ts), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val got = Windows.ewmaValue(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma_centi"))
      .toMap
    // event 1: only itself → 100; event 2: (300·128 + 100·64)/(128+64)
    assert(got(1L) == 100.0)
    assert(got(2L) == (300.0 * 128 + 100.0 * 64) / 192.0)
  }

  test("ewma spikes flag only jumps above 2x the trailing baseline") {
    import spark.implicits._
    val events = Seq((1L, 1L, 10.0), (1L, 2L, 10.0), (1L, 3L, 50.0),
      (1L, 4L, 10.0))
      .map { case (u, e, v) =>
        (u, e, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:0${e}%d"), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val got = Windows.ewmaAnomalies(events).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_spike"))
      .toMap
    // first event: no baseline, never a spike; 50 > 2x(~10): spike;
    // the return to 10 after the spike raised the baseline: not a spike
    assert(got == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
  }

  test("cluster inertia decomposes k01's per-vector distances exactly") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val perVec = Clustering.kmediansAssign(emb).collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(rows => (rows.length.toLong,
        rows.map(r => math.floor(r.getAs[Double]("dist2") * 1e6).toLong)
          .sum)).toMap
    val agg = Clustering.clusterInertia(emb).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Long]("inertia_fp"))).toMap
    assert(agg == perVec)
    assert(agg.keySet.nonEmpty)
  }

  test("unpivot inverts the pivot back to the long-form grid") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val long = Relational.orderStatusUnpivot(orders).collect()
    val wide = Relational.orderStatusPivot(orders).collect()
      .flatMap(r => Seq(
        (r.getString(0), "F", r.getAs[Long]("n_f")),
        (r.getString(0), "O", r.getAs[Long]("n_o")),
        (r.getString(0), "P", r.getAs[Long]("n_p"))))
      .toSet
    assert(long.map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("n"))).toSet == wide)
    // total mass survives the round trip
    assert(long.map(_.getAs[Long]("n")).sum == orders.count())
  }

  test("one-pass multiset set-ops match the builtin composition exactly") {
    // the q34 production form (one scan, duplicity arithmetic) must be
    // row-for-row identical to six-scan intersectAll/exceptAll chains
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val fast = Relational.setOpsAll(orders).collect().toSeq
    val builtin = Relational.setOpsAllBuiltin(orders).collect().toSeq
    assert(fast.nonEmpty && fast.toSet == builtin.toSet)
    assert(fast.groupBy(identity).view.mapValues(_.size).toMap ==
      builtin.groupBy(identity).view.mapValues(_.size).toMap,
      "multiset duplicity must match, not just the distinct rows")
  }
}

/** w23: watermark-lateness profile semantics. */
class WatermarkLatenessSpec extends graft.SparkSpec {
  import spark.implicits._

  test("watermarkLateness: running high-watermark over arrival order, " +
      "exact micros, bucket boundaries inclusive") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // arrival order = event_id; hwm after e2 is 10:05:00, so e3 is 30s
    // late (b1), e4 is 240s late (b2, <=5m inclusive), e5 is 65m late
    // (b4); on-time events report exactly 0
    val ev = Seq(
      (1L, t("2026-01-01 10:00:00"), "click"),
      (2L, t("2026-01-01 10:05:00"), "click"),
      (3L, t("2026-01-01 10:04:30"), "click"),
      (4L, t("2026-01-01 10:01:00"), "click"),
      (5L, t("2026-01-01 09:00:00"), "click"),
      (6L, t("2026-01-01 12:00:00"), "view")
    ).toDF("event_id", "ts", "event_type")
    val rows = graft.operators.Windows.watermarkLateness(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(rows(("click", "b0_on_time")) == ((2L, 0L)))
    assert(rows(("click", "b1_under_1m")) == ((1L, 30L * 1000000L)))
    assert(rows(("click", "b2_under_5m")) == ((1L, 240L * 1000000L)))
    assert(rows(("click", "b4_over_1h")) == ((1L, 3900L * 1000000L)))
    assert(rows(("view", "b0_on_time")) == ((1L, 0L)))
    assert(rows.size == 5)
  }

  test("watermarkLateness on the fixture: totals reconcile, lateness " +
      "non-negative") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val rows = graft.operators.Windows.watermarkLateness(ev).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    rows.foreach(r => assert(r.getAs[Long]("max_late_us") >= 0L))
  }
}
