package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Proof of the co-located join: bucketed tables join WITHOUT a shuffle
  * exchange — the layout that survives a 100x scale-up. */
class BucketingSpec extends SparkSpec {

  test("equi-join of same-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    val orders = (1L to 1000L).map(i => (i, i % 97, i * 1.5))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val items = (1L to 5000L).map(i => (i % 1000 + 1, i, i * 0.1))
      .toDF("l_orderkey", "l_linenumber", "l_quantity")

    // unique table names: managed-table locations survive JVM restarts
    // while the in-memory catalog does not, so reused names collide
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (tOrders, tItems) = (s"b_orders_$tag", s"b_items_$tag")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Bucketing.writeBucketed(orders, tOrders, "o_orderkey")
      Bucketing.writeBucketed(items, tItems, "l_orderkey")
      val joined = Bucketing.bucketedJoin(spark, tOrders, tItems,
        "o_orderkey", "l_orderkey")
      assert(joined.count() == 5000)

      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"expected exchange-free bucketed join, got:\n$plan")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
