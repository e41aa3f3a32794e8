package graft.lake

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FileSkippingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("manifest prune reads a fraction of the files, result is exact") {
    val orders = Tables.orders(spark, sf)
    val dir = FileSkipping.clusteredOrdersDir(spark, orders)
    val (files, total, scan) =
      FileSkipping.prunedRead(spark, dir, "o_orderkey", 1000L, 3000L)
    // range-clustered 16-file layout: a narrow key range touches only
    // the files whose range straddles it, never most of the table
    assert(total === 16)
    assert(files.nonEmpty && files.size < 8,
      s"narrow range hit ${files.size} of $total files - layout not selective")
    val viaSkip = scan.select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    val direct = orders
      .filter(col("o_orderkey") >= 1000 && col("o_orderkey") <= 3000)
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey").collect()
    assert(viaSkip.toSeq === direct.toSeq)
  }

  test("a range outside the domain prunes every file") {
    val orders = Tables.orders(spark, sf)
    val dir = FileSkipping.clusteredOrdersDir(spark, orders)
    val (files, _, scan) =
      FileSkipping.prunedRead(spark, dir, "o_orderkey", -500L, -1L)
    assert(files.isEmpty)
    assert(scan.count() === 0)
  }
}
