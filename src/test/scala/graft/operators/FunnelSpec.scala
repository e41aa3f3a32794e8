package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel enforces strict event-time order per user") {
    val events = Seq(
      // user 1 converts fully in order
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2 purchased BEFORE clicking: reaches step2 only
      (2L, "view", ts(10)), (2L, "purchase", ts(15)), (2L, "click", ts(20)),
      // user 3 clicked before viewing: the later click counts, purchase
      // after it converts
      (3L, "click", ts(5)), (3L, "view", ts(10)), (3L, "click", ts(12)),
      (3L, "purchase", ts(13)),
      // user 4 never viewed: not even step 1
      (4L, "click", ts(10)), (4L, "purchase", ts(20)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.conversionFunnel(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "step1_view" -> 3L,      // users 1, 2, 3
      "step2_click" -> 3L,     // users 1, 2, 3 (clicks after their view)
      "step3_purchase" -> 2L)) // users 1, 3 (user 2's purchase was early)
  }

  test("funnel counts never increase stage over stage on the fixture") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val counts = Funnel.conversionFunnel(events).collect()
      .map(_.getLong(1)).toSeq
    assert(counts.size == 3)
    assert(counts == counts.sorted.reverse,
      s"funnel must be monotone non-increasing: $counts")
  }

  test("group top-k aggregate reproduces the window ranking bitwise") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val viaAgg = Relational.topOrdersPerCustomer(orders, k = 3)
      .collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
      .orderBy("o_custkey", "rank")
      .collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
