package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every build key passes the membership test") {
    import spark.implicits._
    val build = (0L until 1000L).map(_ * 37 + 5).toDF("k")
    val bf = BloomJoin.buildBitmap(build, "k")
    val misses = build.join(broadcast(bf))
      .filter(!BloomJoin.mightContain(col("k"), col("bf")))
      .count()
    assert(misses === 0, "a bloom filter must never reject a member")
  }

  test("bitmap geometry: one row, NumWords dense words") {
    import spark.implicits._
    val bf = BloomJoin.buildBitmap(Seq(1L, 2L, 3L).toDF("k"), "k")
      .collect()
    assert(bf.length === 1)
    assert(bf(0).getSeq[Long](0).length === BloomJoin.NumWords)
  }

  test("prune keeps all matches and removes most non-matches") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val dims = orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val pruned = BloomJoin.bloomPrune(lineitem, "l_orderkey", dims,
      "o_orderkey")
    val total = lineitem.count()
    val matches = lineitem.join(dims,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val kept = pruned.count()
    // no false negatives: every matching fact row survives the prune
    assert(kept >= matches)
    // the point of the filter: the pruned side is a small fraction of
    // the fact table (m=2^16, k=3 at this key count -> fp rate << 1%)
    assert(kept < total / 2,
      s"bloom prune kept $kept of $total fact rows - not selective")
  }

  test("bloom join equals the plain join bitwise") {
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
    val viaBloom = BloomJoin.bloomJoinRevenue(orders, lineitem).collect()
    val dims = orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = lineitem
      .join(dims, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
      .collect()
    assert(viaBloom.toSeq === plain.toSeq)
  }
}
