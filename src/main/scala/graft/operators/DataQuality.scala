package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the constraint layer every
  * production lake runs before publishing a snapshot (table-format CHECK
  * constraints / expectation suites, expressed as one relational audit).
  *
  * Each rule reduces to a violation COUNT so the audit is one pass of
  * scan-aggregates plus one anti-join per referential rule — no row
  * materialization of violations (at 100 TB the violation LIST can be
  * huge; the gate only needs counts, and a follow-up query with the
  * rule's predicate fetches examples on demand). Rule results union into
  * a single tiny frame: publish gates read it, metrics sinks append it. */
object DataQuality {

  /** Audit the orders/lineitem pair: completeness (nulls), domain bounds,
    * key uniqueness, and referential integrity both ways. Returns one row
    * per rule, violation counts, deterministic rule order.
    *
    * ONE pass per table: each side pre-aggregates per key (folding its
    * row-level rules into conditional counts on the way), a single
    * full-outer join on the key classifies orphans in BOTH directions,
    * and one global aggregate + `stack` emits the rule rows. A naive
    * rule-per-subquery audit scans each table once per rule — 6 scans
    * and 2 anti-join shuffles here collapse to 2 scans, 2 partial-agg
    * shuffles and 1 key-cardinality join. */
  def constraintAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val ok = orders.groupBy(col("o_orderkey")).agg(
      count(lit(1)).as("o_rows"),
      count(when(col("o_custkey").isNull, 1)).as("o_null_cust"))
    val lk = lineitem.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("l_rows"),
      count(when(col("l_extendedprice") < 0 || col("l_quantity") <= 0, 1))
        .as("l_neg"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
        .as("l_disc"))
    // o_rows/l_rows are non-null exactly where that side's key group
    // exists — the presence flags of the full-outer classification
    // (a null JOIN KEY never matches, so null-key groups stay unmatched
    // and classify as orphan/childless, same as an anti-join would)
    ok.join(lk, col("o_orderkey") === col("l_orderkey"), "full_outer")
      .agg(
        // null key: the null-key group's rows, plus null-custkey rows of
        // the non-null-key groups (OR semantics without double-count)
        coalesce(sum(when(col("o_rows").isNotNull,
          when(col("o_orderkey").isNull, col("o_rows"))
            .otherwise(col("o_null_cust")))), lit(0L))
          .as("orders_null_key"),
        count(when(col("o_rows") > 1, 1)).as("orders_dup_key"),
        coalesce(sum(col("l_neg")), lit(0L)).as("lineitem_neg_price"),
        coalesce(sum(col("l_disc")), lit(0L))
          .as("lineitem_discount_range"),
        coalesce(sum(when(col("o_rows").isNull, col("l_rows"))), lit(0L))
          .as("lineitem_orphan_fk"),
        coalesce(sum(when(col("l_rows").isNull, col("o_rows"))), lit(0L))
          .as("orders_without_lineitems"))
      .select(expr("""stack(6,
        'orders_null_key', orders_null_key,
        'orders_dup_key', orders_dup_key,
        'lineitem_neg_price', lineitem_neg_price,
        'lineitem_discount_range', lineitem_discount_range,
        'lineitem_orphan_fk', lineitem_orphan_fk,
        'orders_without_lineitems', orders_without_lineitems)
        AS (rule, n_violations)"""))
      .orderBy("rule")
  }

  /** Shuffle-skew audit for one (table, key): the numbers a planner needs
    * before keying a 100 TB shuffle on a column — group-size distribution
    * (max / p50 / p99), key cardinality, and max-vs-average skew ratio.
    * One row out per audited key.
    *
    * Cost shape: one partial-agg shuffle per table (group sizes), then a
    * DISTINCT-group-size funnel — the same distribution trick as the q29
    * percentile tier. The cumulative rank is a fold over
    * `sort_array(collect_list(struct(gsize, nk)))` inside the one global
    * aggregate (array length = |distinct sizes|, tiny even when |keys|
    * is billions) — no `Window.orderBy` and therefore no single-partition
    * window exchange anywhere in the plan. All derived stats are integer
    * arithmetic (×100 fixed-point, ceil-rank percentile) — no float
    * division to drift between engines. */
  def keySkew(df: DataFrame, table: String, keyCol: String): DataFrame = {
    val sizes = df.groupBy(col(keyCol)).agg(count(lit(1)).as("gsize"))
    val dist = sizes.groupBy(col("gsize")).agg(count(lit(1)).as("nk"))
    // ceil-rank percentile: smallest group size whose running key count
    // reaches ceil(p% of keys), folded over the sorted distribution array
    def pctl(p: Int): Column = expr(
      s"""aggregate(dist_arr,
            struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS ans),
            (acc, x) -> struct(acc.cum + x.nk,
              CASE WHEN acc.ans IS NULL
                    AND acc.cum + x.nk >= (n_keys * $p + 99) div 100
                   THEN x.gsize ELSE acc.ans END),
            acc -> acc.ans)""")
    dist
      .agg(
        sum(col("gsize") * col("nk")).as("n_rows"),
        sum(col("nk")).as("n_keys"),
        max(col("gsize")).as("max_group"),
        sort_array(collect_list(struct(col("gsize"), col("nk"))))
          .as("dist_arr"))
      .select(lit(table).as("tbl"), lit(keyCol).as("key_col"),
        col("n_rows"), col("n_keys"), col("max_group"),
        pctl(50).as("p50_group"), pctl(99).as("p99_group"),
        expr("(n_rows * 100) div n_keys").as("avg_group_x100"),
        expr("(max_group * 100 * n_keys) div n_rows").as("skew_x100"))
  }

  /** dq02: the skew audit over the three join/aggregation keys the query
    * ledger actually shuffles on. Each audit is independent — at scale
    * they run as parallel jobs, each one partial-agg pass over its
    * table. */
  def skewAudit(orders: DataFrame, lineitem: DataFrame,
      events: DataFrame): DataFrame =
    keySkew(orders, "orders", "o_custkey")
      .unionAll(keySkew(lineitem, "lineitem", "l_orderkey"))
      .unionAll(keySkew(events, "events", "user_id"))
      .orderBy("tbl", "key_col")

  /** dq03: per-column completeness/cardinality profile — null count,
    * blank count, exact distinct count per profiled column, the third
    * standard audit face (dq01 checks constraints, dq02 checks skew,
    * this checks the COLUMNS themselves: sudden null spikes and
    * cardinality collapses are the classic upstream-breakage signals).
    *
    * The fixture has no nulls or blanks, so the profile runs over a
    * derived frame with deterministic injections (string-cast custkey
    * nulled on orderkey % 13, status blanked on % 7) — the metrics
    * must DETECT them, not just report zeros. One wide aggregate (the
    * multi-countDistinct plans a single expand pass) + `stack` to long
    * form: one scan whatever the column count, no per-column jobs. */
  def completenessProfile(orders: DataFrame): DataFrame = {
    val derived = orders.select(
      when(col("o_orderkey") % 13 === 0, lit(null))
        .otherwise(col("o_custkey").cast("string")).as("custkey"),
      when(col("o_orderkey") % 7 === 0, lit(""))
        .otherwise(col("o_orderstatus")).as("status"),
      col("o_orderpriority").as("priority"))
    val cols = Seq("custkey", "status", "priority")
    val aggExprs = count(lit(1)).as("n_rows") +: cols.flatMap { c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
      sum(when(col(c) === "", 1L).otherwise(0L)).as(s"blank_$c"),
      countDistinct(col(c)).as(s"dist_$c")) }
    val wide = derived.agg(aggExprs.head, aggExprs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', null_$c, blank_$c, dist_$c")
      .mkString(", ")
    wide
      .select(col("n_rows"), expr(s"stack(${cols.size}, $stackArgs)" +
        " AS (col_name, n_null, n_blank, n_distinct)"))
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_blank"), col("n_distinct"))
      .orderBy(col("col_name"))
  }

  /** dq04: equi-width histogram of a numeric column — the distribution
    * face of the profile suite (dq03 counts nulls/cardinality; this
    * shows WHERE the values sit, the input to bin-packing, pricing-tier
    * and outlier checks).
    *
    * Two passes, both trivial at scale: (1) exact min/max aggregate (one
    * partial-agg funnel to a 1-row frame), (2) broadcast the bounds back
    * over the scan and partial-agg the bin counts — `nBins` rows cross
    * the shuffle per input split, never the data. Empty bins are filled
    * by a broadcast range join so the histogram shape is total.
    *
    * Cross-engine determinism: bin = floor((x − min) / w) computed in
    * IEEE double with the IDENTICAL expression tree in the oracle — same
    * input bits + same ops = same result bits in both engines; the top
    * value is clamped into the last bin on both sides. */
  def histogram(df: DataFrame, valueCol: String, nBins: Int = 20): DataFrame = {
    val bounds = df.agg(
      min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))
    val w = (col("mx") - col("mn")) / nBins
    val counts = df.select(col(valueCol).cast("double").as("x"))
      .join(broadcast(bounds))
      .select(least(floor((col("x") - col("mn")) / w), lit(nBins - 1))
        .cast("long").as("bin_id"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_rows"))
    val allBins = bounds.select(
      explode(sequence(lit(0L), lit(nBins - 1L))).as("bin_id"),
      col("mn"), col("mx"))
    allBins.join(counts, Seq("bin_id"), "left")
      .select(col("bin_id"),
        (col("mn") + col("bin_id") * ((col("mx") - col("mn")) / nBins))
          .as("bin_lo"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
      .orderBy(col("bin_id"))
  }

  /** dq05: z-score outlier audit — per-group count of values beyond
    * `nSigma` standard deviations, the numeric-drift tripwire every
    * ingestion pipeline runs before a batch is admitted (a price feed
    * suddenly in cents instead of dollars shows up here, not in
    * completeness counts).
    *
    * Determinism discipline: double SUMs are order-dependent, so the
    * moments accumulate over values quantized to integer hundredths
    * (exact order-free bigint sums — same regime note as heavy hitters:
    * Σx² stays inside int64 up to ~10⁹ rows per group at this value
    * range; past that, swap the quantized moments for DecimalType).
    * Mean/variance/threshold are then a handful of scalar float ops on
    * those exact integers, written as the SAME expression tree in both
    * engines (÷, ×, − and one correctly-rounded sqrt — no libm).
    *
    * Plan shape: one group-keyed moments pass (map-side partial), the
    * group-count-sized stats broadcast back over the scan, one final
    * group agg. Two scans of the input, zero wide rows. */
  def valueOutliers(events: DataFrame, nSigma: Double = 2.0): DataFrame = {
    val vc = floor(col("value") * lit(100.0)).cast("long")
    val base = events.select(col("event_type"), col("value"), vc.as("vc"))
    val stats = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("s1"),
        sum(col("vc") * col("vc")).as("s2"))
    val mean = col("s1").cast("double") / col("n").cast("double")
    val varPop = col("s2").cast("double") / col("n").cast("double") -
      mean * mean
    val isOut = abs(col("vc").cast("double") - mean) >
      lit(nSigma) * sqrt(varPop)
    base.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        min(when(isOut, col("value"))).as("out_min"),
        max(when(isOut, col("value"))).as("out_max"))
      .orderBy(col("event_type"))
  }

  /** Functional-dependency audit: for each candidate rule X → Y, how
    * many X values map to MORE than one distinct Y — the schema-drift /
    * denormalization-integrity check profilers run before trusting a
    * column as a lookup key (a violated FD means "X is not a key for
    * Y"; a freshly-violated one means upstream started double-writing).
    *
    * Per rule: one (X)-keyed exact count-distinct aggregate (Spark's
    * two-phase distinct expansion — the (X, Y) pre-distinct shuffles by
    * both columns, so a hot X spreads over its Y variants), then a
    * rule-level rollup to four counters. Violations are COUNTED, never
    * materialized — the audit output is rules-sized regardless of data
    * size. Rules on different tables scan independently (no shared-scan
    * opportunity exists). */
  def fdAudit(rules: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(rules.nonEmpty, "need at least one FD rule")
    rules.map { case (name, df, det, dep) =>
      df.select(col(det).as("x"), col(dep).as("y"))
        .groupBy(col("x"))
        .agg(countDistinct(col("y")).as("variants"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("variants") > 1, 1L).otherwise(0L))
            .as("n_violating"),
          max(col("variants")).as("max_variants"))
        .select(lit(name).as("rule"), col("n_keys"), col("n_violating"),
          col("max_variants"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_.unionAll(_)).orderBy(col("rule"))
  }

  /** Equi-DEPTH histogram (equal row mass per bucket) — the profiling
    * complement of [[histogram]]'s equi-width bins, and the boundary
    * source for range-partitioned layouts. Computed entirely on the
    * VALUE DISTRIBUTION (the q29 trick): per group, distinct values
    * with counts, a cumulative sum over the value order, and bucket =
    * `(rows_before · nBuckets) div n` — whole tie-groups land in one
    * bucket, everything is exact integer arithmetic, and the per-group
    * funnel is |distinct values| rows, never the row count. Groups
    * spread across tasks (window partitions by the group key). */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
      nBuckets: Int = 4): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("v"))
    val cum = counts.withColumn("cum", sum(col("c")).over(w))
    val totals = cum.groupBy(col(groupCol)).agg(max(col("cum")).as("n"))
    cum.join(totals, groupCol)
      .withColumn("bucket",
        expr(s"(cum - c) * $nBuckets div n"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(sum(col("c")).as("n_rows"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
      .orderBy(col(groupCol), col("bucket"))
  }

  /** Feed-freshness audit: per stream slice, when did data last
    * arrive and how far does it lag the freshest slice — the first
    * alarm of a dead upstream (a partition that silently stopped
    * producing looks healthy to row-count checks for hours). Lag is
    * integer microsecond arithmetic floor-divided to minutes — exact,
    * no timezone or float hazards. One group aggregate; the 1-row
    * global max broadcasts back. */
  def freshnessAudit(events: DataFrame): DataFrame = {
    val per = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_seen"))
    val g = per.agg(max(col("last_seen")).as("global_last"))
    per.join(broadcast(g))
      .select(col("event_type"), col("n_events"), col("last_seen"),
        expr("(unix_micros(global_last) - unix_micros(last_seen))" +
          " div 60000000").as("lag_minutes"))
      .orderBy(col("event_type"))
  }

  /** Leading-digit distribution (Benford-style forensic profile): the
    * first significant digit of each amount, with observed shares —
    * fabricated or clamped monetary data departs from the natural
    * heavy-1 distribution, and a drifting digit profile is a cheap
    * upstream-change alarm even where Benford's law itself doesn't
    * apply. The digit comes from the DECIMAL STRING of the floored
    * long (integer→string is engine-stable; no log10, no float
    * formatting). One scan, 9-row output, 1-row total broadcast
    * back. */
  def leadingDigitProfile(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(
      floor(col(valueCol)).cast("long").cast("string"), 1, 1)
    val counts = df.filter(col(valueCol) >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.join(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total").cast("double"))
          .as("share"))
      .orderBy(col("digit"))
  }

  /** Cross-table financial reconciliation: does the order header's
    * total agree with the sum of its line items? — the referential
    * AMOUNT check (dq01 checks key existence; this checks the money).
    * Output is a banded distribution of the relative difference, not a
    * boolean, because real feeds disagree by degrees (rounding, tax
    * recalc, partial fills) and the drift BAND is what pages someone.
    * On this synthetic feed headers don't derive from lines at all and
    * the audit says so — every order lands in a far band.
    *
    * Line sums are decimal-exact (order-free); the relative difference
    * is a two-op float tree over those exact sums, identical in both
    * engines. One key-partitioned join + a bands-sized final agg. */
  def reconciliationAudit(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val sums = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .as("line_total"))
    val rel = abs(col("o_totalprice").cast("double") -
      col("line_total").cast("double")) /
      col("o_totalprice").cast("double")
    orders.join(sums, col("o_orderkey") === col("l_orderkey"), "left")
      .select(when(col("line_total").isNull, "no_lineitems")
        .when(rel <= 0.01, "within_1pct")
        .when(rel <= 0.10, "within_10pct")
        .when(rel <= 0.50, "within_50pct")
        .otherwise("beyond_50pct").as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("band"))
  }

  /** Join-cardinality estimation WITHOUT running the join:
    * |A ⨝ B on k| = Σ_k c_A(k)·c_B(k), over the per-key count tables —
    * the planner-side diagnostic that catches a key-explosion join
    * (quadratic blowup on hot keys) before it runs. Also reports the
    * worst single key's output (the skew share AQE would have to
    * split). Count tables are |keys|-sized; the key join shuffles
    * those, never the inputs — at 100 TB this costs two count aggs,
    * not the join. Exact, not an estimate, because the count tables
    * are exact; swap in CountMinSketch frames when even |keys| is too
    * big. */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val la = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("ca"))
    val ra = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cb"))
    la.join(ra, "k")
      .select(col("k"), (col("ca") * col("cb")).as("rows_k"))
      .agg(count(lit(1)).as("n_matching_keys"),
        sum(col("rows_k")).as("est_join_rows"),
        max(col("rows_k")).as("max_key_rows"))
  }

  /** dq13: partition-drift monitor — period-over-period row-count deltas
    * per event-time day, the arrival-volume alarm that complements dq10
    * (freshness says WHEN a slice last produced; this says whether
    * today's VOLUME looks like yesterday's — a half-sized partition from
    * a flaky upstream passes both freshness and null checks). Flag is an
    * integer cross-multiply (|Δ|·10 > prev ⇔ drift > 10%), no float
    * threshold. Days without a predecessor are omitted (inner join):
    * every emitted row has exact non-null arithmetic.
    *
    * Scale: one day-keyed count agg (map-side combined, output is
    * O(days)), then a self-join of that days-sized frame on day-1 —
    * broadcast-sized at any corpus scale; no window, no funnel. */
  def partitionDrift(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val prev = daily.select(col("day").as("prev_day"),
      col("n_events").as("prev_n"))
    daily.join(prev, col("day") === date_add(col("prev_day"), 1))
      .select(col("day"), col("n_events"), col("prev_n"),
        (col("n_events") - col("prev_n")).as("delta"),
        (abs(col("n_events") - col("prev_n")) * 10L > col("prev_n"))
          .as("drift_flag"))
      .orderBy(col("day"))
  }

  /** dq12: key-sequence gap audit — where did an expected-contiguous id
    * space lose rows? Completeness checks (dq03) count nulls; row counts
    * miss silent range drops (a lost file, a truncated extract, a
    * producer that skipped an id block). Bucketing the key space
    * (`bucket = key div bucketSize`) and comparing each bucket's
    * observed count to its occupied span localizes every hole to a
    * bucket WITHOUT a window function: per-bucket `missing_in_span =
    * (max−min+1) − n_keys` is exact integer arithmetic inside one
    * map-side-combinable aggregate. (TPC-H's o_orderkey is sparse by
    * DESIGN — only 1 in 4 ids is used — so the fixture profile shows
    * uniform ~75% holes; a real contiguous feed shows 0 except where
    * data was lost, which is the alarm.)
    *
    * Scale: one hash shuffle on O(keys/bucketSize) derived groups with
    * partial aggregation; no sort, no window, no global funnel. */
  def sequenceGaps(df: DataFrame, keyCol: String,
      bucketSize: Long = 1000L): DataFrame =
    df.select(col(keyCol).cast("long").as("k"))
      .groupBy(expr(s"k div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        min(col("k")).as("key_min"), max(col("k")).as("key_max"))
      .select(col("bucket"), col("n_keys"), col("key_min"), col("key_max"),
        (col("key_max") - col("key_min") + 1L - col("n_keys"))
          .as("missing_in_span"))
      .orderBy(col("bucket"))

  /** dq14: distribution-drift audit — each source's document-length
    * distribution against the REST of the corpus, the shift detector a
    * training pipeline runs between crawl snapshots / feed partitions
    * before mixing them (a source whose length histogram walked away
    * from the corpus usually changed extractor, not content). The
    * statistic is total-variation distance over fixed-width length
    * buckets, computed as an EXACT integer numerator: TV = Σ|p_s −
    * p_r|/2 with p = cnt/total becomes `tv_num = Σ|c_s·t_r − c_r·t_s|`
    * (one cross-multiply per bucket, all longs), divided ONCE by
    * `2·t_s·t_r` in double — no libm, bit-stable, unlike a PSI whose
    * per-bucket `ln` differs in last bits across engines while ranking
    * the same drifts.
    *
    * Scale: one (source, bucket) count shuffle (map-side combined,
    * O(sources·buckets) groups); the per-bucket totals and per-source
    * totals are derived aggregates of that tiny frame; the
    * sources×buckets grid cross is dims-sized (t18's precedent) and the
    * final reduce is again O(sources·buckets). Nothing corpus-sized
    * past the first aggregate. Products stay < 2⁵³ up to ~3·10⁷ rows
    * per side per bucket ratio — beyond that, widen to DECIMAL. */
  def distributionDrift(documents: DataFrame,
      bucketWidth: Long = 100L): DataFrame = {
    val sb = documents
      .select(col("source"), expr(s"n_chars div $bucketWidth").as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
    val tb = sb.groupBy(col("bucket")).agg(sum(col("c")).as("ct"))
    val ts = sb.groupBy(col("source")).agg(sum(col("c")).as("t"))
    val n = tb.agg(sum(col("ct")).as("n"))
    val grid = sb.select(col("source")).distinct()
      .crossJoin(broadcast(tb))
    grid
      .join(sb, Seq("source", "bucket"), "left")
      .select(col("source"), col("bucket"),
        coalesce(col("c"), lit(0L)).as("c_s"),
        (col("ct") - coalesce(col("c"), lit(0L))).as("c_r"))
      .join(broadcast(ts), "source")
      .crossJoin(broadcast(n))
      .groupBy(col("source"), col("t"), col("n"))
      .agg(sum(abs(col("c_s") * (col("n") - col("t")) -
        col("c_r") * col("t"))).as("tv_num"))
      .select(col("source"), col("t").as("n_docs"),
        (col("n") - col("t")).as("n_rest"), col("tv_num"),
        (col("tv_num").cast("double") /
          (lit(2.0) * col("t") * (col("n") - col("t")))).as("tv"))
      .orderBy(col("source"))
  }

  /** dq16: label-balance audit over the embedding table — the
    * class-imbalance read consumed before anything trains or votes on
    * the labels (s25's kNN vote, the quantizer's per-cell balance,
    * stratified eval draws): per-label counts and shares plus each
    * label's imbalance versus a perfectly uniform split, flagged by
    * INTEGER cross-multiply (n·|labels| > 2·N ⇔ share > 2× uniform —
    * no float threshold). One count aggregate, label-domain-sized
    * output; the total and label count ride back as a one-row
    * broadcast. */
  def labelBalance(embeddings: DataFrame): DataFrame = {
    val counts = embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"))
    val totals = counts.agg(sum(col("n_vectors")).as("total"),
      count(lit(1)).as("n_labels"))
    counts.crossJoin(broadcast(totals))
      .select(col("label"), col("n_vectors"),
        (col("n_vectors").cast("double") / col("total").cast("double"))
          .as("share"),
        (col("n_vectors") * col("n_labels") > col("total") * 2L)
          .as("over_represented"))
      .orderBy(col("label"))
  }

  /** dq15: embedding-table audit — the vector-side [[constraintAudit]]:
    * before a 100 TB embedding store feeds the ANN/dedup tiers, the
    * things that silently corrupt them are checked here: NULL vectors,
    * NaN/±Inf components (one NaN poisons every cosine it touches and
    * breaks ranking transitivity), zero-norm vectors (cosine division
    * by zero), width drift (a mixed-dim table breaks every fold), and
    * duplicate ids (double-counted neighbors). One row per rule.
    *
    * Plan shape: ONE corpus scan folds every per-vector predicate into
    * scan-stage booleans; the width histogram is an O(distinct widths)
    * aggregate whose modal row (most common width, ties toward the
    * smaller) broadcasts back; one global conditional-count aggregate +
    * `stack` emits the report. The norm check reuses the exact
    * [[Dedup.dotExpr]] fold, so "zero norm" means bitwise 0.0 in both
    * engines, not an epsilon. */
  def embeddingAudit(embeddings: DataFrame): DataFrame = {
    val flags = embeddings.select(
      col("vec_id"),
      col("embedding").isNull.as("is_null"),
      size(col("embedding")).as("dim"),
      when(col("embedding").isNull, lit(false))
        .otherwise(exists(col("embedding"), x => isnan(x))).as("has_nan"),
      when(col("embedding").isNull, lit(false))
        .otherwise(exists(col("embedding"),
          x => x === lit(Float.PositiveInfinity) ||
            x === lit(Float.NegativeInfinity))).as("has_inf"),
      when(col("embedding").isNull, lit(false))
        .otherwise(Dedup.dotExpr("embedding", "embedding") === lit(0.0))
        .as("zero_norm"))
    val modal = flags.filter(!col("is_null"))
      .groupBy(col("dim")).agg(count(lit(1)).as("c"))
      .agg(min_by(col("dim"), struct((lit(0L) - col("c")).as("negc"),
        col("dim").as("d"))).cast("long").as("modal_dim"))
    flags.crossJoin(broadcast(modal))
      .agg(
        count(lit(1)).as("n_vectors"),
        (count(lit(1)) - count_distinct(col("vec_id"))).as("dup_vec_id"),
        count(when(col("is_null"), 1)).as("null_embedding"),
        count(when(!col("is_null") &&
          col("dim").cast("long") =!= col("modal_dim"), 1))
          .as("wrong_dim"),
        count(when(col("has_nan"), 1)).as("nan_component"),
        count(when(col("has_inf"), 1)).as("inf_component"),
        count(when(col("zero_norm"), 1)).as("n_zero_norm"),
        min(col("modal_dim")).as("modal_dim"))
      .select(expr("""stack(8,
        'dup_vec_id', dup_vec_id,
        'inf_component', inf_component,
        'modal_dim', modal_dim,
        'n_vectors', n_vectors,
        'nan_component', nan_component,
        'null_embedding', null_embedding,
        'wrong_dim', wrong_dim,
        'zero_norm', n_zero_norm) AS (rule, n)"""))
      .orderBy(col("rule"))
  }

  /** dq17: MEDIAN/MAD robust outlier audit — [[valueOutliers]]' z-score
    * tripwire breaks exactly when it matters most: a batch of gross
    * outliers inflates the mean AND the standard deviation it is judged
    * against (masking), so the corrupted feed passes its own gate. The
    * robust form (Hampel identifier: flag |x − median| > k·MAD) has a
    * 50% breakdown point — half the batch must be corrupt before the
    * threshold moves — and is the estimator profiling suites reach for
    * on heavy-tailed value feeds.
    *
    * Determinism discipline: NO float enters the decision path. Values
    * quantize to integer hundredths (the dq05/heavy-hitters regime);
    * the per-group median is the LOWER median of the quantized-value
    * DISTRIBUTION (rank (n+1)/2 over distinct values with cumulative
    * counts — the q29/IVF-training median), the MAD is the same lower
    * median over the EXACT integer deviations |vc − med|, and the flag
    * `|vc − med| > k·MAD` compares longs. Every count, rank, deviation
    * and threshold is order-free integer arithmetic — bitwise equal in
    * any engine at any partitioning; the doubles in the OUTPUT (median,
    * mad, share) are single exact-integer renderings, never inputs.
    *
    * Plan shape (the q29 distribution trick, twice): pass 1 = one
    * (group, value) partial-agg count table + per-group cumulative rank
    * over DISTINCT values (the only sequential step — distinct ≪ rows
    * for quantized domains) → group-count-sized medians broadcast back;
    * pass 2 = the identical shape over (group, |vc − med|); final =
    * one conditional-count aggregate with both tiny stat frames
    * broadcast. Three scan-shaped passes, no wide rows, no per-group
    * value buffers — group count rows of output at any corpus size. */
  def madOutliers(events: DataFrame, k: Long = 3L): DataFrame = {
    val base = events.select(col("event_type"),
      floor(col("value") * lit(100.0)).cast("long").as("vc"))

    // lower median of an integer column per group, via the distinct-value
    // cumulative-count distribution (no per-group buffering)
    def lowerMedian(df: DataFrame, valueCol: String,
        as: String): DataFrame = {
      val counts = df.groupBy(col("event_type"), col(valueCol).as("v"))
        .agg(count(lit(1)).as("c"))
      val cum = counts.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("event_type"))
          .orderBy(col("v"))))
      cum.withColumn("n",
          max(col("cum")).over(Window.partitionBy(col("event_type"))))
        .withColumn("rk", expr("(n + 1) div 2"))
        .filter(col("cum") - col("c") < col("rk") &&
          col("rk") <= col("cum"))
        .select(col("event_type"), col("v").as(as))
    }

    val med = lowerMedian(base, "vc", "med")
    val dev = base.join(broadcast(med), "event_type")
      .select(col("event_type"), col("vc"),
        abs(col("vc") - col("med")).as("adc"))
    val mad = lowerMedian(dev, "adc", "mad")
    dev.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("med")).as("medq"),
        min(col("mad")).as("madq"),
        sum(when(col("adc") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .select(col("event_type"), col("n"),
        (col("medq").cast("double") / lit(100.0)).as("median_value"),
        (col("madq").cast("double") / lit(100.0)).as("mad_value"),
        col("n_outliers"),
        (col("n_outliers").cast("double") / col("n").cast("double"))
          .as("outlier_share"))
      .orderBy(col("event_type"))
  }
}
