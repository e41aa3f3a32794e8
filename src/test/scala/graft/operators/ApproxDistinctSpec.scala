package graft.operators

import graft.SparkSpec

/** The HLL sketch has no exact oracle; pin its error bound instead. */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct lands within rsd bounds of exact") {
    import spark.implicits._
    val orders = (1L to 20000L).map(i => (i % 3 match {
      case 0 => "O"; case 1 => "F"; case _ => "P"
    }, i % 4231)).toDF("o_orderstatus", "o_custkey")
    Relational.approxDistinctCustomers(orders, rsd = 0.02).collect()
      .foreach { r =>
        val approx = r.getAs[Long]("approx_customers").toDouble
        val exact = r.getAs[Long]("exact_customers").toDouble
        assert(math.abs(approx - exact) / exact < 0.1,
          s"HLL estimate $approx too far from exact $exact")
      }
  }
}
