package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sketch percentile path (q26) against the exact path (q23): with
  * accuracy above the group cardinality the sketch must return EXACTLY the
  * discrete percentile (the element at rank ceil(p·n)) — the regime the
  * DuckDB oracle checks — and at production accuracy the returned element's
  * rank must stay inside the documented n/accuracy bound. */
class ApproxPercentileSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val li = graft.Tables.lineitem(spark, sf)
    .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))

  test("high-accuracy sketch equals the exact discrete percentile") {
    // Independent discrete-percentile computation: element at rank
    // ceil(0.5 * n) in ascending l_quantity order per group.
    val w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    val g = Window.partitionBy("l_returnflag")
    val expected = li
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(g))
      .filter(col("rn") === ceil(col("n") * 0.5))
      .select(col("l_returnflag"), col("l_quantity").as("median_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    val got = Relational.approxPercentiles(li)
      .select(col("l_returnflag"), col("median_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(got == expected)
  }

  test("low-accuracy sketch stays within the n/accuracy rank bound") {
    val acc = 50
    val approx = Relational.approxPercentiles(li, accuracy = acc)
      .select(col("l_returnflag"), col("median_qty"))
    val checked = li.join(broadcast(approx), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("l_quantity") < col("median_qty"), 1L).otherwise(0L))
          .as("rank_lo"),
        sum(when(col("l_quantity") <= col("median_qty"), 1L).otherwise(0L))
          .as("rank_hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      val (lo, hi, n) =
        (r.getAs[Long]("rank_lo"), r.getAs[Long]("rank_hi"), r.getAs[Long]("n"))
      val target = 0.5 * n
      val err = n.toDouble / acc + 1 // documented bound, +1 for rank ties
      // the returned value occupies ranks (lo, hi]; that interval must
      // overlap the target rank within the error bound
      assert(lo <= target + err && hi >= target - err,
        s"group ${r.getString(0)}: ranks ($lo,$hi] vs target $target ± $err")
    }
  }
}
