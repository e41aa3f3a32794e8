package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-value correctness and the property the layout
  * exists for — range-partitioning on z bounds BOTH dimensions per
  * partition, where a single-column sort bounds only its own. */
class LayoutSpec extends SparkSpec {

  test("zValue interleaves bits (known Morton codes)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 1L),
      (7L, 7L), (5L, 3L)).toDF("a", "b")
    val out = df.select(Layout.zValue(col("a"), col("b"), 3))
      .collect().map(_.getLong(0)).toSeq
    // morton(a,b) with a on even bits: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    // (2,1)=6 (7,7)=63 (5,3)=27
    assert(out == Seq(0L, 1L, 2L, 3L, 6L, 63L, 27L))
  }

  test("zValueSql computes the same codes in DuckDB dialect terms") {
    // evaluate the generated SQL text through Spark (same operators:
    // >> & << +) to pin the two formulations together
    val sql = Layout.zValueSql("a", "b", 3)
    import spark.implicits._
    val df = Seq((5L, 3L), (7L, 7L)).toDF("a", "b")
    val out = df.selectExpr(s"$sql AS z").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(27L, 63L))
  }

  test("z-order partitioning bounds both dimensions; single-column sort does not") {
    // full 64x64 key grid -> 8 partitions; measure the avg per-partition
    // value range of dimension b under (i) sort by a, (ii) z-order
    val grid = spark.range(0, 4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    def avgBRange(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("b") - min("b")).as("r"))
        .agg(avg("r")).collect()(0).getDouble(0)
      r
    }
    val byA = avgBRange(grid.repartitionByRange(8, col("a")))
    val byZ = avgBRange(Layout.zorderRepartition(grid,
      Layout.zValue(col("a"), col("b"), 6), 8))
    assert(byZ < 0.7 * byA,
      s"z-order must shrink the secondary dimension's spread: byZ=$byZ byA=$byA")
  }
}
