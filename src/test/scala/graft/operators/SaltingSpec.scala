package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join correctness: identical results to the plain join on
  * pathologically skewed data, and the hot key actually scatters. */
class SaltingSpec extends SparkSpec {

  test("salted join equals plain join on 90%-skewed keys") {
    import spark.implicits._
    // 9000 rows on key 1 (hot), 1000 spread over keys 2..101
    val skewed = ((1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => (i % 100 + 2L, (9000 + i).toLong)))
      .toDF("k", "row_id")
    val dim = (1L to 101L).map(k => (k, s"dim_$k")).toDF("k", "label")

    val plain = skewed.join(dim, "k")
      .select("row_id", "label").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(skewed, dim, "k", "row_id", salts = 8)
      .select("row_id", "label").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 10000)
  }

  test("hot key scatters across multiple salt values") {
    import spark.implicits._
    val skewed = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "row_id")
    val nSalts = skewed
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(nSalts == 8)
  }
}
