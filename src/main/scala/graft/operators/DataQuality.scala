package graft.operators

import org.apache.spark.sql.DataFrame
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
}
