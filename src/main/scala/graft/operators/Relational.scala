package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator layer (SURVEY.md §2 `EXT` rows): scans, filters,
  * equi/broadcast/semi/anti/outer joins, grouped aggregation, cube/rollup,
  * sort/limit/top-k, set operations — each as a plain DataFrame combinator so
  * Catalyst owns optimization (pushdown, pruning, join selection, AQE).
  *
  * Numeric discipline for the DuckDB oracle: every SUM over a double money /
  * quantity column goes through an explicit `DecimalType` cast, so the
  * aggregate is exact and order-independent — identical across Spark task
  * topologies AND across engines. Final outputs cast back to double (both
  * engines derive the same IEEE value from the same exact decimal).
  */
object Relational {

  /** Exact, summation-order-independent SUM of a double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: decimal-exact sum divided by the non-null count — matching
    * SQL AVG semantics (sum skips NULLs, so must the denominator). */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(18, scale))).cast("double") / count(c))

  /** TPC-H Q1-style pricing summary: scan → filter → hash aggregate.
    * Partial aggregation (map-side combine) keeps the shuffle at
    * |groups| × partitions, constant in row count — the 100 TB shape. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        dsum((col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Selective filter + narrow projection — exists to prove pushdown:
    * `.explain` must show PushedFilters on l_shipdate/l_quantity and a
    * ReadSchema of exactly the 4 output columns. */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("2000-02-01")) &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** TPC-H Q3-style: two shuffled equi-joins (orders⋈lineitem big-big →
    * sort-merge under AQE; customer side broadcastable) + top-k revenue.
    * Ordering ties broken by key so top-k is engine-deterministic. */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame =
    customer
      .filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")) &&
        col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** TPC-H Q4-style order-priority check: LEFT SEMI join (exists) then
    * grouped count. Semi-join avoids materializing the big side. */
  def orderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1996-07-01")))
      .join(lineitem.filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q5-style: 6-table join. nation/region are FIXED-cardinality (25 /
    * 5 rows at any SF) — broadcast them explicitly. customer/supplier are
    * SF-proportional (billions of rows at 100 TB), so NO hint: AQE's
    * runtime-stats broadcast conversion decides per deployment. */
  def regionRevenue(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    lineitem
      .join(orders.filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))

  /** TPC-H Q6-style forecast: pure scan-filter-aggregate, no shuffle beyond
    * the final single-row reduce. */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))

  /** LEFT OUTER join + grouped agg: per-customer order stats, keeping
    * customers with zero orders (count of o_orderkey, not count(*)). */
  def customerOrderStats(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("order_count"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy(col("c_custkey"))

  /** LEFT ANTI join: customers with no orders in 1995 (the fixture has no
    * fully order-less customers, so anti-join against a year slice keeps the
    * result non-empty — a 0-row result would be a vacuous correctness check). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === 1995),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** ORDER BY … LIMIT k → TakeOrderedAndProjectExec: per-partition top-k +
    * driver merge; no global sort of the full table. */
  def topKOrders(orders: DataFrame, k: Int = 15): DataFrame =
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)

  /** DISTINCT (hash aggregate, partial+final) + global sort. */
  def distinctSegments(customer: DataFrame): DataFrame =
    customer.select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  /** Grouped aggregation with multiple measures incl. exact count-distinct
    * (expand + two-phase agg) and min/max. */
  def orderStatsByStatus(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderstatus"))

  /** ROLLUP over (region, nation): hierarchical subtotals + grand total.
    * GROUPING() disambiguates NULL-as-subtotal from NULL data. */
  def revenueRollup(customer: DataFrame, orders: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("g_region"), col("g_nation"),
        col("sum_price"), col("n_orders"))
      .orderBy(col("g_region"), col("g_nation"), col("region_name"),
        col("nation_name"))

  /** CUBE over (returnflag, linestatus): all grouping combinations. */
  def lineitemCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("g_rf"), col("g_ls"),
        col("sum_qty"), col("n_rows"))
      .orderBy(col("g_rf"), col("g_ls"), col("returnflag"), col("linestatus"))

  /** Set operations: INTERSECT / EXCEPT / UNION of buyer-key sets from two
    * order years (each set op is a built-in hash-based physical op). */
  def setOps(orders: DataFrame): DataFrame = {
    val y1995 = orders
      .filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === 1995)
      .select(col("o_custkey"))
    val y2000 = orders
      .filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === 2000)
      .select(col("o_custkey"))
    val both = y1995.intersect(y2000).withColumn("set_kind", lit("both"))
    val only1995 = y1995.except(y2000).withColumn("set_kind", lit("only_1995"))
    val only2000 = y2000.except(y1995).withColumn("set_kind", lit("only_2000"))
    both.unionByName(only1995).unionByName(only2000)
      .select(col("set_kind"), col("o_custkey").as("custkey"))
      .orderBy(col("set_kind"), col("custkey"))
  }

  /** q34: the MULTISET forms of [[setOps]] — INTERSECT ALL / EXCEPT ALL
    * duplicity semantics (a customer with 3 orders in 1995 and 1 in 2000
    * contributes min(3,1)=1 'both' row and 3−1=2 'only_1995' rows), which
    * is what bag-semantics reconciliation between two feeds needs: "how
    * many MORE times does this key appear on the left".
    *
    * Computed as ONE pass of duplicity arithmetic rather than three
    * `intersectAll`/`exceptAll` calls: the naive composition scans the
    * input SIX times (each builtin re-aggregates both sides); here one
    * scan builds the per-key (n_1995, n_2000) count table — a single
    * conditional aggregate, map-side combined — and all three multiset
    * results are projections of it, replicated to duplicity with an
    * `explode(sequence)` over count-table-sized rows. Bitwise parity
    * with the builtin composition is spec-asserted (SetOpsAllSpec). */
  def setOpsAll(orders: DataFrame): DataFrame = {
    val y = org.apache.spark.sql.functions.year(col("o_orderdate"))
    val counts = orders
      .filter(y.isin(1995, 2000))
      .groupBy(col("o_custkey"))
      .agg(sum(when(y === 1995, 1L).otherwise(0L)).as("nl"),
        sum(when(y === 2000, 1L).otherwise(0L)).as("nr"))
    counts
      .select(col("o_custkey"), explode(array(
        struct(lit("both").as("set_kind"),
          least(col("nl"), col("nr")).as("copies")),
        struct(lit("only_1995").as("set_kind"),
          greatest(col("nl") - col("nr"), lit(0L)).as("copies")),
        struct(lit("only_2000").as("set_kind"),
          greatest(col("nr") - col("nl"), lit(0L)).as("copies"))))
        .as("k"))
      .filter(col("k.copies") > 0)
      .select(col("k.set_kind").as("set_kind"),
        col("o_custkey").as("custkey"),
        explode(sequence(lit(1L), col("k.copies"))).as("dup"))
      .select(col("set_kind"), col("custkey"))
      .orderBy(col("set_kind"), col("custkey"))
  }

  /** The builtin-operator composition of [[setOpsAll]] — the executable
    * spec the one-pass form is parity-checked against, and the §2.7 API
    * coverage of `intersectAll`/`exceptAll` themselves. */
  def setOpsAllBuiltin(orders: DataFrame): DataFrame = {
    val y1995 = orders
      .filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === 1995)
      .select(col("o_custkey"))
    val y2000 = orders
      .filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === 2000)
      .select(col("o_custkey"))
    val both = y1995.intersectAll(y2000).withColumn("set_kind", lit("both"))
    val only1995 =
      y1995.exceptAll(y2000).withColumn("set_kind", lit("only_1995"))
    val only2000 =
      y2000.exceptAll(y1995).withColumn("set_kind", lit("only_2000"))
    both.unionByName(only1995).unionByName(only2000)
      .select(col("set_kind"), col("o_custkey").as("custkey"))
      .orderBy(col("set_kind"), col("custkey"))
  }

  /** Scalar-function sweep (SURVEY §2.8): string slice/search/replace/trim/
    * concat, casts, date parts, CASE — all codegen'd builtins. */
  def scalarShowcase(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_upper"),
      lower(col("p_type")).as("type_lower"),
      length(col("p_name")).cast("long").as("name_len"),
      substring(col("p_name"), 1, 8).as("name_prefix"),
      locate("a", col("p_name")).cast("long").as("first_a"),
      regexp_replace(col("p_type"), "[aeiou]", "_").as("type_devowel"),
      trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"),
      col("p_brand").endsWith("1").as("brand_ends_1"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      col("p_size").cast("long").as("size_long"),
      when(col("p_retailprice") > 1500, "premium")
        .when(col("p_retailprice") > 800, "standard")
        .otherwise("budget").as("price_tier"))
      .orderBy(col("p_partkey"))

  /** SQL front-end face: arbitrary GROUPING SETS (beyond rollup/cube's
    * fixed shapes) through `spark.sql` over registered views — the same
    * Catalyst plan as the DataFrame API, exercised via SQL text. */
  def sqlGroupingSets(spark: SparkSession, orders: DataFrame,
      customer: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_v")
    customer.createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        |  COALESCE(o_orderstatus, 'ALL') AS status,
        |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price,
        |  COUNT(*) AS n
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus), ())
        |ORDER BY g_seg, g_st, segment, status""".stripMargin)
  }

  /** Correlated LATERAL subquery (top-2 customers per nation) — the SQL
    * surface for per-group top-k where the inner query references the
    * outer row. Catalyst DECORRELATES it: the per-nation LIMIT rewrites
    * into a ranked window join, so execution is one shuffle by the
    * correlation key — no nested-loop re-execution of the inner query
    * per outer row (the disaster this shape becomes on engines that
    * execute lateral literally; PlanAudit asserts the plan). */
  def sqlLateralTopN(spark: SparkSession, nation: DataFrame,
      customer: DataFrame): DataFrame = {
    nation.createOrReplaceTempView("nation_v")
    customer.createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT n.n_name AS nation, t.c_name, t.c_acctbal
        |FROM nation_v n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer_v c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY nation, c_acctbal DESC, c_name""".stripMargin)
  }

  /** Semi-structured props: parse the events JSON column as a MapType,
    * extract a key, aggregate — from_json handling per SURVEY §7 item 6
    * (multimodal/props extension). Narrow parse + one hash-agg shuffle. */
  def propsJson(events: DataFrame): DataFrame = {
    val k = element_at(
      from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType)),
      "k")
    events
      .withColumn("k", k)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** HyperLogLog++ cardinality sketch (approx_count_distinct) beside the
    * exact count — the constant-memory distinct estimator for 100 TB
    * cardinalities. Approximate by design: no DuckDB oracle (driver
    * records a rows-only check); the spec asserts the estimate lands
    * within rsd bounds of exact. */
  def approxDistinctCustomers(orders: DataFrame, rsd: Double = 0.05): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), rsd).as("approx_customers"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      .orderBy(col("o_orderstatus"))

  /** Exact percentiles with linear interpolation (SQL percentile_cont
    * semantics) per group — distributed exact computation; at extreme
    * cardinalities swap for approx_percentile's sketch. */
  def percentiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("price_p25"),
        expr("percentile(l_extendedprice, 0.75)").as("price_p75"))
      .orderBy(col("l_returnflag"))

  /** EXACT percentiles without the per-group value buffer — the third
    * tier beside [[percentiles]] (exact, buffering) and
    * [[approxPercentiles]] (sketch). The exact aggregate holds every
    * group value in ONE final aggregator; here the heavy work is a
    * (group, value) frequency table — distributed across the cluster by
    * value — and the only per-group sequential step is a running sum over
    * DISTINCT values. For discrete/bucketed domains (quantities, prices,
    * durations: the common percentile targets) distinct ≪ rows, making
    * this exact AND scale-safe; for truly continuous domains it degrades
    * to the buffering form's cardinality and the sketch tier is the
    * answer.
    *
    * Interpolation replicates Spark's `percentile` (= SQL
    * percentile_cont) step for step — pos = p·(n−1), then the weighted
    * two-sided form (⌈pos⌉ − pos)·v_lo + (pos − ⌊pos⌋)·v_hi, which
    * differs from the v_lo + Δ·frac form in final-ULP rounding — so
    * results are bitwise identical to [[percentiles]] and share its
    * DuckDB oracle. */
  def percentilesByDistribution(lineitem: DataFrame): DataFrame = {
    val g = "l_returnflag"

    def valueAtRanks(valueCol: String,
        ps: Seq[(String, Double)]): DataFrame = {
      val counts = lineitem.groupBy(col(g), col(valueCol).as("v"))
        .agg(count(lit(1)).as("c"))
      val cum = counts.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col(g)).orderBy(col("v"))))
      val ranks = cum.groupBy(col(g)).agg(max(col("cum")).as("n"))
        .select(col(g), explode(array(ps.map { case (name, p) =>
          struct(lit(name).as("pname"),
            (lit(p) * (col("n") - 1).cast("double")).as("pos"))
        }: _*)).as("r"))
        .select(col(g), col("r.pname").as("pname"), col("r.pos").as("pos"),
          (floor(col("r.pos")) + 1).cast("long").as("klo"),
          (ceil(col("r.pos")) + 1).cast("long").as("khi"))
      // a 1-based rank k falls in the value row covering [cum-c+1, cum];
      // equi-join on the group key + a between filter — per-group work is
      // O(ranks x distinct values), distributed by group
      def at(kCol: String, out: String) = ranks.alias("r")
        .join(cum.alias("d"), col(s"r.$g") === col(s"d.$g") &&
          col(s"r.$kCol").between(col("d.cum") - col("d.c") + 1,
            col("d.cum")))
        .select(col(s"r.$g").as(g), col("r.pname").as("pname"),
          col("r.pos").as("pos"), col("d.v").as(out))
      at("klo", "vlo").join(at("khi", "vhi"), Seq(g, "pname", "pos"))
        .select(col(g), col("pname"),
          when(floor(col("pos")) === ceil(col("pos")), col("vlo"))
            .otherwise(
              (ceil(col("pos")) - col("pos")) * col("vlo") +
                (col("pos") - floor(col("pos"))) * col("vhi"))
            .as("pval"))
    }

    // demonstrated on the DISCRETE column (l_quantity: ~50 distinct
    // values per group at any SF) — the domain this tier exists for;
    // near-all-distinct columns like price belong to the buffering or
    // sketch tiers
    valueAtRanks("l_quantity",
      Seq(("qty_p25", 0.25), ("median_qty", 0.5), ("qty_p75", 0.75)))
      .groupBy(col(g))
      .agg(
        max(when(col("pname") === "qty_p25", col("pval"))).as("qty_p25"),
        max(when(col("pname") === "median_qty", col("pval")))
          .as("median_qty"),
        max(when(col("pname") === "qty_p75", col("pval"))).as("qty_p75"))
      .orderBy(col(g))
  }

  /** Sketch percentiles — the 100-TB path beside [[percentiles]]: exact
    * `percentile` buffers every value of a group in one final aggregator
    * (3 groups funnel a whole 100 TB column through 3 reducers), while
    * `approx_percentile`'s summaries merge map-side in O(accuracy) memory
    * per group. Rank error is bounded by n/accuracy rows, so whenever
    * accuracy exceeds the group cardinality the sketch returns the EXACT
    * discrete percentile (the element at rank ceil(p·n)) — which is what
    * the oracle checks; at larger n it degrades gracefully to a bounded-
    * error estimate instead of an OOM.
    *
    * Accuracy-vs-n COST crossover (the r17 ×8 adjudication): the
    * Greenwald–Khanna summary behind `approx_percentile` retains
    * essentially every sample while n(group) < accuracy, and each
    * compress cycle (every ~10k inserts) walks the whole retained
    * buffer — so in the exactness regime the per-group cost is
    * O(n²/10⁴), quadratic. Once n(group) clears accuracy the retained
    * size caps at ~O(accuracy) and the cost goes linear: O(n·accuracy/
    * 10⁴). Measured on this query: accuracy 10⁶ (groups ~200k → ~1.6M,
    * entirely inside the quadratic regime) gave ×8-data time factor
    * 12.2–13.9; accuracy 2¹⁷ = 131072 (both sides past the cap) is the
    * recorded ≲8 linear entry. The default is pinned at 2¹⁷: the oracle
    * fixture's largest group (~20k rows) keeps rank error 20046/131072
    * < 1 row — still EXACT where correctness is checked — while any
    * production-scale group runs the bounded-memory path. A deployment
    * that needs tighter rank error at bigger n raises accuracy and
    * knowingly pays the quadratic constant up to that bound. */
  def approxPercentiles(lineitem: DataFrame,
      accuracy: Int = 131072): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5D, $accuracy)")
          .as("median_qty"),
        expr(s"approx_percentile(l_extendedprice, 0.25D, $accuracy)")
          .as("price_p25"),
        expr(s"approx_percentile(l_extendedprice, 0.75D, $accuracy)")
          .as("price_p75"))
      .orderBy(col("l_returnflag"))

  /** Array-function sweep over the embedding column (SURVEY §2.8's absent
    * array scalars, exercised as EXT): size/index/minmax/slice-fold/sort.
    * Float values stay floats end to end — no float→string casts, whose
    * formatting is engine-specific. The sorted top-3 is projected as three
    * scalar float columns (not an array) so downstream row-hash harnesses
    * that sort rows can handle the output. */
  def arrayShowcase(embeddings: DataFrame): DataFrame = {
    val sortedDesc = reverse(array_sort(col("embedding")))
    embeddings.select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("n_dims"),
      try_element_at(col("embedding"), lit(1)).as("first_dim"),
      array_max(col("embedding")).as("vmax"),
      array_min(col("embedding")).as("vmin"),
      expr("""aggregate(slice(embedding, 1, 4), 0D,
        |  (acc, x) -> acc + cast(x as double))""".stripMargin)
        .as("head4_sum"),
      // try_element_at, not element_at: under ANSI mode an out-of-range
      // index must yield NULL (DuckDB [i] semantics), not throw, for
      // embeddings shorter than 3 dims
      try_element_at(sortedDesc, lit(1)).as("top1"),
      try_element_at(sortedDesc, lit(2)).as("top2"),
      try_element_at(sortedDesc, lit(3)).as("top3"))
      .orderBy(col("vec_id"))
  }

  /** Correlated EXISTS through the SQL surface — the way SQL users write
    * the §2.3 semi-join. Catalyst decorrelates the subquery into a
    * left-semi hash join (no per-row subquery execution — PlanAudit
    * asserts no nested loop), so the SQL text and the DataFrame
    * `leftsemi` form plan identically at any scale. */
  def sqlCorrelatedExists(spark: SparkSession, customer: DataFrame,
      orders: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("customer_v")
    orders.createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_mktsegment FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** q39: null-safe join semantics — `<=>` (IS NOT DISTINCT FROM)
    * joins NULL keys to NULL keys where plain `=` silently drops every
    * null-keyed row. That difference is a classic silent-data-loss bug
    * in feeds with optional keys; this query measures it directly by
    * running both joins over the same nullable-keyed sides and
    * reporting the pair counts.
    *
    * Scale note: `EqualNullSafe` is still an equi-join key to Spark —
    * both variants plan hash/sort-merge joins on the key, never a
    * nested loop (swept by PlanAudit); the null bucket hashes to one
    * value, so heavy null shares deserve the usual skew levers. */
  def nullSafeJoinDiff(orders: DataFrame): DataFrame = {
    val key = when(col("o_custkey") % 50 === 0, lit(null))
      .otherwise(col("o_custkey") % 1000)
    val y = org.apache.spark.sql.functions.year(col("o_orderdate"))
    val a = orders.filter(y === 1995).select(key.as("ka"))
    val b = orders.filter(y === 2000).select(key.as("kb"))
    val nullsafe = a.join(b, col("ka") <=> col("kb"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit("nullsafe").as("join_kind"), col("n_pairs"))
    val plain = a.join(b, col("ka") === col("kb"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit("plain").as("join_kind"), col("n_pairs"))
    nullsafe.unionAll(plain).orderBy(col("join_kind"))
  }

  /** q37: correlated SCALAR subqueries — the other decorrelation face
    * next to [[sqlCorrelatedExists]]'s EXISTS: "orders 1.5× above
    * their customer's average". Catalyst rewrites each correlated
    * scalar aggregate into an aggregate-then-left-join on the
    * correlation key, so the query runs as two hash aggregations and
    * joins, never a per-row subquery loop.
    *
    * The comparison is cross-multiplied into integers (price·2·n >
    * 3·sum over cents) so the threshold is exact — an AVG-of-doubles
    * form could flip borderline rows between engines on the last
    * bit of a shuffle-order sum. */
  def sqlAboveCustomerAverage(spark: SparkSession,
      orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_q37")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_q37 o
        |WHERE CAST(floor(o_totalprice * 100) AS BIGINT) * 2 *
        |  (SELECT COUNT(*) FROM orders_q37 i
        |     WHERE i.o_custkey = o.o_custkey) >
        |  3 * (SELECT SUM(CAST(floor(i.o_totalprice * 100) AS BIGINT))
        |     FROM orders_q37 i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Pivot (crosstab) of order counts: priority rows × status columns —
    * the wide-report form of grouped aggregation (SURVEY §2.4 EXT).
    *
    * The status values are passed EXPLICITLY: `pivot(col)` without a value
    * list runs a driver-side distinct job over the pivot column before the
    * plan even builds — a full extra pass at 100 TB, and an unbounded
    * output schema. With the list, this is one hash aggregation whose
    * schema is fixed at plan time. Missing combinations surface as 0, not
    * null, so the output is total. */
  def orderStatusPivot(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy(col("o_orderpriority"))

  /** q36: UNPIVOT — [[orderStatusPivot]]'s inverse, via the native
    * `Dataset.unpivot` (melt) API: the wide per-priority status counts
    * fold back into (priority, status, n) long form. Unpivot is a
    * zero-shuffle row-expansion projection (each wide row emits one row
    * per value column); the only shuffles are the pivot's own. The
    * round-trip property (pivot ∘ unpivot = identity on the grid) is
    * what reconciliation between wide exports and long fact tables
    * leans on. */
  def orderStatusUnpivot(orders: DataFrame): DataFrame =
    orderStatusPivot(orders)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("n_f").as("F"), col("n_o").as("O"), col("n_p").as("P")),
        "o_orderstatus", "n")
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  /** JSON construction (SURVEY §2.8 F11 — the reference's Javalin/Jackson
    * response maps as an engine scalar): struct → compact JSON text. */
  def jsonConstruct(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      to_json(struct(
        col("p_brand").as("brand"),
        col("p_size").as("size"),
        col("p_type").as("type"))).as("part_json"))
      .orderBy(col("p_partkey"))

  /** Bottom-k (KMV) distinct sketch per group via the typed Aggregator
    * UDAF — exact, deterministic, mergeable state (unlike q18's HLL this
    * IS oracle-checkable: the k smallest hashes of a set don't depend on
    * partitioning). Output: the sorted bottom-8 customer-key hashes
    * ('|'-joined to one string so row-sorting harnesses can hash it) and
    * the exact distinct count they summarize. */
  def bottomKCustomers(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderstatus"))
      .agg(
        array_join(
          graft.functions.BottomKSketch.bottomK(8)(
            md5(col("o_custkey").cast("string").cast("binary"))),
          "|").as("bottom8"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .orderBy(col("o_orderstatus"))

  /** Date/time function sweep over orders. */
  def dateShowcase(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      org.apache.spark.sql.functions.year(col("o_orderdate")).cast("long").as("order_year"),
      month(col("o_orderdate")).cast("long").as("order_month"),
      dayofmonth(col("o_orderdate")).cast("long").as("order_day"),
      quarter(col("o_orderdate")).cast("long").as("order_quarter"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
        .as("plus_3_months"),
      datediff(to_date(lit("2002-01-01")), to_date(col("o_orderdate")))
        .cast("long").as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  /** Mergeable aggregate state per group: row count + decimal-exact sum.
    * The maintained shape of an incremental materialized view. */
  def aggState(lineitem: DataFrame): DataFrame =
    lineitem.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n_rows"),
      sum(col("l_extendedprice").cast(DecimalType(18, 2)))
        .as("sum_price_dec"))

  /** Merge aggregate states: union + re-aggregate (sum of counts, sum of
    * sums) — valid because count and decimal-sum are commutative
    * monoids, the property that makes the aggregate incrementally
    * maintainable at all. */
  def mergeAggStates(states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("sum_price_dec")).as("sum_price_dec"))

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * maintained agg over yesterday's base plus the agg of today's delta,
    * MERGED — never a recompute over the full fact table. At 100 TB this
    * is the difference between touching the delta partition and touching
    * the lake; the oracle is the full recompute, which the merged state
    * must equal bitwise. */
  def incrementalAggDemo(lineitem: DataFrame): DataFrame = {
    val base = lineitem.filter(col("l_orderkey") % 10 =!= 0)
    val delta = lineitem.filter(col("l_orderkey") % 10 === 0)
    mergeAggStates(aggState(base), aggState(delta))
      .select(col("l_returnflag"), col("n_rows"),
        col("sum_price_dec").cast("double").as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Incremental JOIN maintenance — the view-maintenance identity for a
    * materialized join V = A ⨝ B under inserts ΔA, ΔB:
    *
    *   V′ = V  ∪  (ΔA ⨝ B)  ∪  (A ⨝ ΔB)  ∪  (ΔA ⨝ ΔB)
    *
    * (q30 maintains an AGGREGATE view; this is the join-view counterpart
    * — together they cover the two shapes real materialized pipelines
    * refresh incrementally.)
    *
    * Scale story: each delta term joins a DELTA (today's partition)
    * against a base side, never base ⨝ base — at 100 TB the recompute
    * touches |Δ|-proportional data, and the base-side scan of the two
    * mixed terms is semi-join-reducible to delta keys (exactly the
    * [[BloomJoin]] pre-filter, composable here). The oracle is the full
    * recompute over A′ ⨝ B′, which the maintained union must equal
    * bitwise — the identity holds exactly because the four terms
    * partition the pairs of (old ∪ new) × (old ∪ new) rows.
    *
    * Deterministic demo split: customers arriving "today" are
    * c_custkey % 10 = 3, orders arriving today are o_orderkey % 10 = 0. */
  def incrementalJoinDemo(customer: DataFrame, orders: DataFrame): DataFrame = {
    val custBase = customer.filter(col("c_custkey") % 10 =!= 3)
    val custDelta = customer.filter(col("c_custkey") % 10 === 3)
    val ordBase = orders.filter(col("o_orderkey") % 10 =!= 0)
    val ordDelta = orders.filter(col("o_orderkey") % 10 === 0)
    def j(c: DataFrame, o: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("c_mktsegment"),
          col("o_totalprice"))
    j(custBase, ordBase)                 // V: yesterday's view
      .unionByName(j(custBase, ordDelta)) // ΔB against old A
      .unionByName(j(custDelta, ordBase)) // ΔA against old B
      .unionByName(j(custDelta, ordDelta)) // ΔA ⨝ ΔB
      .orderBy(col("o_orderkey"))
  }

  /** q33: grouped top-k as a mergeable bounded aggregate — the
    * RELATIONAL face of the [[graft.functions.TopKByScore]] fix the ANN
    * tier got: "top 3 orders by value per customer" partial-aggregates
    * to ≤ k rows per customer per input split MAP-SIDE, so the shuffle
    * carries k·|splits| rows per key instead of every order, and no
    * task sorts more than k rows of state. q31 keeps the window form
    * (the right plan when the per-group row count is bounded); this is
    * the plan you want when groups are huge — same results, proved by
    * the row_number oracle. */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    val agg = graft.functions.TopKByScore.topK(k)(
      col("o_totalprice").cast("double"), col("o_orderkey"))
    orders.groupBy(col("o_custkey")).agg(agg.as("top"))
      .select(col("o_custkey"),
        posexplode(col("top")).as(Seq("pos", "nb")))
      .select(col("o_custkey"), col("nb.id").as("o_orderkey"),
        col("nb.score").as("o_totalprice"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("o_custkey"), col("rank"))
  }
}
