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
    * per rule, violation counts, deterministic rule order. */
  def constraintAudit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    def rule(name: String, count: DataFrame): DataFrame =
      count.select(lit(name).as("rule"),
        col("n").cast("long").as("n_violations"))

    val nullKeys = rule("orders_null_key",
      orders.filter(col("o_orderkey").isNull ||
        col("o_custkey").isNull).agg(count(lit(1)).as("n")))
    val dupKeys = rule("orders_dup_key",
      orders.groupBy("o_orderkey").count()
        .filter(col("count") > 1).agg(count(lit(1)).as("n")))
    val negPrice = rule("lineitem_neg_price",
      lineitem.filter(col("l_extendedprice") < 0 ||
        col("l_quantity") <= 0).agg(count(lit(1)).as("n")))
    val discountRange = rule("lineitem_discount_range",
      lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1)
        .agg(count(lit(1)).as("n")))
    val orphanLines = rule("lineitem_orphan_fk",
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"),
        "left_anti").agg(count(lit(1)).as("n")))
    val childlessOrders = rule("orders_without_lineitems",
      orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"),
        "left_anti").agg(count(lit(1)).as("n")))
    nullKeys.unionByName(dupKeys).unionByName(negPrice)
      .unionByName(discountRange).unionByName(orphanLines)
      .unionByName(childlessOrders)
      .orderBy("rule")
  }
}
