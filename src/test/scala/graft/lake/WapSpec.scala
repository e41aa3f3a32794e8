package graft.lake

import org.apache.spark.sql.functions._

/** l16: write–audit–publish — the staged-commit governance loop. */
class WapSpec extends graft.SparkSpec {
  import spark.implicits._

  test("wap: clean delta publishes, dirty delta is rejected and the " +
      "published table is exactly base + clean") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val rows = LakeQueries.wapRead(spark, orders).collect()
      .map(r => r.getAs[String]("delta_id") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_bad_price"),
          r.getAs[Long]("n_dup_keys"), r.getAs[Boolean]("published"),
          r.getAs[Long]("published_rows"),
          r.getAs[Long]("published_key_sum"))).toMap
    assert(rows.keySet == Set("delta1_clean", "delta2_dirty"))
    val d1 = rows("delta1_clean")
    val d2 = rows("delta2_dirty")
    // delta1: zero violations, published
    assert(d1._2 == 0L && d1._3 == 0L && d1._4)
    // delta2: both audits fire, rejected
    assert(d2._2 > 0L, "no bad-price violations — fixture drifted")
    assert(d2._3 > 0L, "no dup-key violations — fixture drifted")
    assert(!d2._4)
    // published state = base (%3==0) + clean (%3==1), never delta2
    val expect = orders.filter(col("o_orderkey") % 3 =!= 2)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect().head
    assert(d1._5 == expect.getLong(0) && d2._5 == expect.getLong(0))
    assert(d1._6 == expect.getLong(1))
    // the reject path left no staging residue that a re-read picks up:
    // a second call (cached store) returns identical rows
    val again = LakeQueries.wapRead(spark, orders).collect()
    assert(again.map(_.toString).sorted.toSeq ==
      LakeQueries.wapRead(spark, orders).collect()
        .map(_.toString).sorted.toSeq)
    assert(again.length == 2)
  }
}
