package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Constraint audit: every rule fires on a deliberately broken fixture
  * (the driver fixture is clean, so zeros there prove nothing alone). */
class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  test("each rule counts its own violation class") {
    val orders = Seq(
      (Some(1L), Some(10L)), // ok
      (Some(1L), Some(11L)), // dup key
      (None, Some(12L)), // null key
      (Some(3L), None), // null custkey
      (Some(4L), Some(13L)) // no lineitems
    ).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (1L, 100.0, 1.0, 0.05), // ok
      (99L, 50.0, 2.0, 0.1), // orphan fk
      (1L, -5.0, 1.0, 0.2), // negative price
      (1L, 10.0, 0.0, 1.5) // zero qty + discount out of range
    ).toDF("l_orderkey", "l_extendedprice", "l_quantity", "l_discount")
    val out = DataQuality.constraintAudit(orders, lineitem)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("orders_null_key") == 2)
    assert(out("orders_dup_key") == 1)
    assert(out("lineitem_neg_price") == 2) // neg price + zero qty rows
    assert(out("lineitem_discount_range") == 1)
    assert(out("lineitem_orphan_fk") == 1)
    assert(out("orders_without_lineitems") == 3) // null-key rows count too
  }

  test("skew audit: fixed-point stats on a hand-built skewed key") {
    // key "a" x10, keys "b".."k" x1 → sizes dist {1: 10 keys, 10: 1 key}
    val df = (Seq.fill(10)("a") ++ ('b' to 'k').map(_.toString))
      .toDF("k")
    val r = DataQuality.keySkew(df, "t", "k").collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_rows") == 20L && m("n_keys") == 11L)
    assert(m("max_group") == 10L)
    // p50: ceil(11*0.5)=6 ≤ cum(gsize=1)=10 → 1; p99: ceil(10.89)=11 → 10
    assert(m("p50_group") == 1L && m("p99_group") == 10L)
    assert(m("avg_group_x100") == 181L) // 2000 div 11
    assert(m("skew_x100") == 550L) // 10*100*11 div 20
  }

  test("completeness profile detects injected nulls and blanks") {
    import spark.implicits._
    // orderkeys 1..91: 7 multiples of 13 -> null custkey; 13 multiples
    // of 7 -> blank status; priority untouched
    val orders = (1L to 91L).map(k =>
      (k, k % 5, "O", s"${k % 3}-PRIO"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val out = DataQuality.completenessProfile(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("custkey", "priority", "status"))
    // 5 distinct custkey strings survive the nulling (13,26,..,91 span
    // all residues mod 5, but the surviving 84 keys still cover 0..4)
    assert(out("custkey") == ((91L, 7L, 0L, 5L)))
    // blanked status rows leave 2 distinct values: "O" and ""
    assert(out("status") == ((91L, 0L, 13L, 2L)))
    assert(out("priority") == ((91L, 0L, 0L, 3L)))
  }

  test("incremental agg merge equals full recompute") {
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val merged = Relational.incrementalAggDemo(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val full = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("s"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(merged == full)
  }

  test("incremental join maintenance equals full recompute") {
    val sf = "/root/testdata/sf0.001"
    val cust = graft.Tables.customer(spark, sf)
    val ord = graft.Tables.orders(spark, sf)
    val incr = Relational.incrementalJoinDemo(cust, ord).collect().toSeq
    val full = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey")).collect().toSeq
    assert(incr == full)
  }

  test("histogram: total bin range, counts sum to rows, empty bins zero") {
    import spark.implicits._
    // 3 tight values + 1 far outlier: bins 1..18 must exist and be zero
    val df = Seq(0.0, 1.0, 2.0, 100.0).toDF("x")
    val h = DataQuality.histogram(df, "x", nBins = 20).collect()
    assert(h.length === 20)
    assert(h.map(_.getLong(2)).sum === 4)
    assert(h.head.getLong(2) === 3)   // 0,1,2 land in bin 0 (width 5)
    assert(h.last.getLong(2) === 1)   // the max value clamps into bin 19
    assert(h.slice(1, 19).map(_.getLong(2)).forall(_ == 0))
    // bin_lo ladder starts at min and steps by width
    assert(h.head.getDouble(1) === 0.0)
    assert(h(1).getDouble(1) === 5.0)
  }

  test("valueOutliers flags only the planted extreme value per group") {
    // 'pay': nine 10.00s and one 1000.00 -> |1000 - mean| > 2 sigma for
    // the plant only; 'ok': uniform values, zero outliers
    val events = ((1 to 9).map(_ => ("pay", 10.0)) :+ ("pay", 1000.0)) ++
      (1 to 5).map(_ => ("ok", 7.5))
    val df = events.toDF("event_type", "value")
    val out = DataQuality.valueOutliers(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("pay").getAs[Long]("n_outliers") == 1L)
    assert(out("pay").getAs[Double]("out_min") == 1000.0)
    assert(out("pay").getAs[Double]("out_max") == 1000.0)
    assert(out("ok").getAs[Long]("n_outliers") == 0L)
    assert(out("ok").isNullAt(out("ok").fieldIndex("out_min")))
  }

  test("equi-depth buckets balance row mass and never overlap") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf)
    val h = DataQuality.equiDepthHistogram(li, "l_returnflag",
      "l_quantity", nBuckets = 4).collect()
    val byFlag = h.groupBy(_.getString(0))
    for ((_, rows) <- byFlag) {
      val masses = rows.map(_.getAs[Long]("n_rows"))
      val total = masses.sum
      // equal depth up to tie-group granularity: no bucket strays far
      // from total/4 on the ~50-distinct-value quantity column
      assert(masses.forall(m => m > total / 8 && m < total * 3 / 8),
        s"unbalanced buckets: ${masses.toSeq} of $total")
      // value ranges ascend without overlap across the bucket order
      val sorted = rows.sortBy(_.getAs[Long]("bucket"))
      val pairs = sorted.map(r => (r.getAs[Any]("v_min").toString.toDouble,
        r.getAs[Any]("v_max").toString.toDouble))
      assert(pairs.forall { case (lo, hi) => lo <= hi })
      assert(pairs.sliding(2).forall {
        case Array((_, hi), (lo2, _)) => hi < lo2
        case _ => true
      }, s"overlapping bucket ranges: ${pairs.toSeq}")
    }
  }

  test("leading-digit profile counts first significant digits with shares") {
    import spark.implicits._
    val df = Seq(123.45, 19.99, 1.02, 987.0, 0.5)
      .toDF("o_totalprice")
    val got = DataQuality.leadingDigitProfile(df, "o_totalprice")
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n"),
        r.getAs[Double]("share"))).toMap
    // 0.5 excluded (< 1); digits: 1 (123, 19, 1), 9 (987)
    assert(got == Map("1" -> ((3L, 0.75)), "9" -> ((1L, 0.25))))
  }

  test("freshness audit reports integer minute lag vs the freshest slice") {
    import spark.implicits._
    val events = Seq(
      ("alive", "2024-01-01 12:00:00"), ("alive", "2024-01-01 11:00:00"),
      ("stale", "2024-01-01 10:30:30"))
      .map { case (t, ts) => (t, java.sql.Timestamp.valueOf(ts)) }
      .toDF("event_type", "ts")
    val got = DataQuality.freshnessAudit(events).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("lag_minutes"))).toMap
    // stale's last event is 89.5 min behind; integer floor -> 89
    assert(got == Map("alive" -> ((2L, 0L)), "stale" -> ((1L, 89L))))
  }

  test("reconciliation bands the header-vs-lines difference correctly") {
    import spark.implicits._
    val orders = Seq((1L, 100.0), (2L, 100.0), (3L, 100.0))
      .toDF("o_orderkey", "o_totalprice")
    // order 1 reconciles exactly; order 2 is 20% off; order 3 childless
    val lines = Seq((1L, 60.0), (1L, 40.0), (2L, 80.0))
      .toDF("l_orderkey", "l_extendedprice")
    val got = DataQuality.reconciliationAudit(orders, lines).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    assert(got == Map("within_1pct" -> 1L, "within_50pct" -> 1L,
      "no_lineitems" -> 1L))
  }

  test("sequence gaps localize a silent range drop to its bucket") {
    import spark.implicits._
    // contiguous ids 0..29 bucketed by 10, with 13..17 silently dropped:
    // bucket 1 must report exactly those 5 missing, buckets 0/2 zero
    val keys = ((0L to 12L) ++ (18L to 29L)).toDF("k")
    val got = DataQuality.sequenceGaps(keys, "k", bucketSize = 10L)
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("missing_in_span")))
      .toMap
    assert(got == Map(0L -> ((10L, 0L)), 1L -> ((5L, 5L)),
      2L -> ((10L, 0L))))
  }

  test("partition drift flags the half-sized day and keeps steady days") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // day1: 10 rows, day2: 10 rows (steady), day3: 4 rows (-60% drift)
    val events = ((1 to 10).map(i => t(f"2026-03-01T10:00:$i%02dZ")) ++
      (1 to 10).map(i => t(f"2026-03-02T10:00:$i%02dZ")) ++
      (1 to 4).map(i => t(f"2026-03-03T10:00:$i%02dZ"))).toDF("ts")
    val got = DataQuality.partitionDrift(events).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("delta"), r.getAs[Boolean]("drift_flag"))).toMap
    // day1 has no predecessor -> omitted; day2 steady; day3 flagged
    assert(got == Map("2026-03-02" -> ((0L, false)),
      "2026-03-03" -> ((-6L, true))))
  }

  test("distribution drift: identical distributions read zero, disjoint read one") {
    import spark.implicits._
    // srcA and srcB share one length histogram (TV = 0); srcC lives in
    // its own bucket entirely (TV vs rest = 1)
    val docs = (Seq.fill(4)(50L) ++ Seq.fill(4)(150L)).zipWithIndex
      .flatMap { case (n, i) =>
        Seq((i.toLong * 2, "srcA", n), (i.toLong * 2 + 1, "srcB", n))
      } ++ (0 until 4).map(i => (100L + i, "srcC", 950L))
    val got = docs.toDF("doc_id", "source", "n_chars")
      .select(col("doc_id"), lit("x").as("text"), col("source"),
        col("n_chars"))
      .transform(d => DataQuality.distributionDrift(d))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tv_num"),
          r.getAs[Double]("tv"))).toMap
    // srcA vs rest (srcB 8 + srcC 4 = 12 docs): buckets 0 and 1 hold
    // 4/8 of srcA vs 4/12 rest each; bucket 9 holds 0 vs 4/12.
    // tv_num = |4*12-4*8| + |4*12-4*8| + |0*12-4*8| = 16+16+32 = 64
    // tv = 64 / (2*8*12) = 1/3
    assert(got("srcA") == ((8L, 64L, 64.0 / 192.0)))
    assert(got("srcB") == ((8L, 64L, 64.0 / 192.0)))
    // srcC is fully disjoint from the rest -> TV = 1
    val (nC, tvNumC, tvC) = got("srcC")
    assert(nC == 4L && tvC == 1.0 &&
      tvNumC == 2L * 4L * 16L) // = 2·t_s·t_r exactly at TV 1
  }

  test("join cardinality matches the actually-executed join exactly") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, sf)
    val li = graft.Tables.lineitem(spark, sf)
    val est = DataQuality.joinCardinality(orders, "o_orderkey",
      li, "l_orderkey").collect().head
    val actual = orders.join(li,
      col("o_orderkey") === col("l_orderkey")).count()
    assert(est.getAs[Long]("est_join_rows") == actual,
      "count-table product must equal the real join size")
    assert(est.getAs[Long]("max_key_rows") <= actual)
  }

  test("embedding audit flags each corruption class exactly once") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f)),           // width drift
      (4L, null.asInstanceOf[Array[Float]]),    // null vector
      (5L, Array(Float.NaN, 1.0f)),             // NaN component
      (6L, Array(Float.PositiveInfinity, 1.0f)), // Inf component
      (7L, Array(0.0f, 0.0f)),                  // zero norm
      (7L, Array(5.0f, 5.0f))                   // duplicate id
    ).toDF("vec_id", "embedding")
    val got = DataQuality.embeddingAudit(emb).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n")).toMap
    assert(got == Map(
      "n_vectors" -> 8L, "dup_vec_id" -> 1L, "null_embedding" -> 1L,
      "modal_dim" -> 2L, "wrong_dim" -> 1L, "nan_component" -> 1L,
      "inf_component" -> 1L, "zero_norm" -> 1L))
  }

  test("label balance: counts, shares, and the 2x-uniform flag") {
    import spark.implicits._
    // 3 labels over 12 rows: label 0 x8 (over 2x uniform = 8), 1 x3, 2 x1
    val emb = ((1L to 8L).map(i => (i, 0)) ++
      Seq((9L, 1), (10L, 1), (11L, 1), (12L, 2)))
      .map { case (id, l) => (id, l, Array(1.0f)) }
      .toDF("vec_id", "label", "embedding")
    val got = DataQuality.labelBalance(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Double]("share"),
          r.getAs[Boolean]("over_represented")))).toMap
    // 8*3 = 24 == 2*12 -> NOT over (strict >); flag only past 2x
    assert(got == Map(0 -> ((8L, 8.0 / 12.0, false)),
      1 -> ((3L, 0.25, false)), 2 -> ((1L, 1.0 / 12.0, false))))
    val skew = DataQuality.labelBalance(
      emb.union(Seq((13L, 0, Array(1.0f)))
        .toDF("vec_id", "label", "embedding"))).collect()
      .map(r => r.getAs[Int]("label") ->
        r.getAs[Boolean]("over_represented")).toMap
    assert(skew == Map(0 -> true, 1 -> false, 2 -> false))
  }

  test("embedding audit on the fixture: clean except the census rows") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = DataQuality.embeddingAudit(emb).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n")).toMap
    assert(got("n_vectors") == emb.count())
    assert(got("modal_dim") == 64L)
    for (rule <- Seq("dup_vec_id", "null_embedding", "wrong_dim",
        "nan_component", "inf_component", "zero_norm"))
      assert(got(rule) == 0L, s"fixture unexpectedly dirty: $rule")
  }

  test("MAD outliers: hand-computed medians, and the masking case " +
      "where the z-score gate misses what the robust gate catches") {
    import spark.implicits._
    // group a: 7 clean values 1.00..7.00 + 3 gross outliers; group b clean
    val rows =
      (1 to 7).map(i => ("a", i.toDouble)) ++
        Seq(("a", 1000.0), ("a", 2000.0), ("a", 3000.0)) ++
        (10 to 14).map(i => ("b", i.toDouble))
    val events = rows.toDF("event_type", "value")
    val got = DataQuality.madOutliers(events).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // a: lower median of {100..700, 1e5, 2e5, 3e5} at rank 5 = 500;
    // deviations {0,100,100,200,200,300,400,99500,199500,299500} rank 5
    // = 200; flag adc > 600 → exactly the 3 gross rows
    assert(got("a").getAs[Double]("median_value") == 5.0)
    assert(got("a").getAs[Double]("mad_value") == 2.0)
    assert(got("a").getAs[Long]("n_outliers") == 3L)
    assert(got("a").getAs[Double]("outlier_share") == 0.3)
    // b: median 12.00, MAD 1.00, nothing beyond 3 MAD
    assert(got("b").getAs[Double]("median_value") == 12.0)
    assert(got("b").getAs[Double]("mad_value") == 1.0)
    assert(got("b").getAs[Long]("n_outliers") == 0L)
    // masking: the 3 gross rows inflate mean AND sigma so the dq05
    // z-score gate admits 2 of them — the robust gate's reason to exist
    val z = DataQuality.valueOutliers(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_outliers")).toMap
    assert(z("a") == 1L)
  }
}
