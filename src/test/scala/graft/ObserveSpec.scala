package graft

import org.apache.spark.sql.functions._

/** Observable metrics (`Dataset.observe`): pipeline health counters
  * collected DURING the job — row counts, null tallies, value sums ride
  * along with the action instead of costing a second scan. This is how
  * a production ingest job reports "rows in / rows dropped / total
  * value" without re-reading 100 TB; the same API feeds
  * StreamingQueryListener metrics on streams. */
class ObserveSpec extends SparkSpec {

  test("observe() collects health counters in the same pass as the job") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
    val observed = orders.observe("ingest_health",
      count(lit(1)).as("rows_seen"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L))
        .as("null_prices"),
      max(col("o_orderkey")).as("max_key"))
    // one action drives both the query result and the metrics; they
    // surface on the QueryExecution that actually ran
    val filtered = observed.filter(col("o_totalprice") > 0)
    val kept = filtered.collect().length
    val m = filtered.queryExecution.observedMetrics("ingest_health")
    assert(m.getAs[Long]("rows_seen") == orders.count())
    assert(m.getAs[Long]("rows_seen") >= kept)
    assert(m.getAs[Long]("null_prices") == 0L)
    assert(m.getAs[Long]("max_key") ==
      orders.agg(max(col("o_orderkey"))).collect().head.getLong(0))
  }
}
