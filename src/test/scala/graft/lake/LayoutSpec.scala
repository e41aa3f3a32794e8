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

  test("zValueN interleaves three columns (known codes)") {
    import spark.implicits._
    // n=3: bit i of col j lands at 3i+j.
    // (3,1,2): a=11 b=01 c=10 -> pos0:a0=1 pos1:b0=1 pos2:c0=0
    //   pos3:a1=1 pos4:b1=0 pos5:c1=1 -> 0b101011 = 43
    // (7,7,7) with 3 bits -> all 9 low bits set = 511
    val df = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (3L, 1L, 2L), (7L, 7L, 7L)).toDF("a", "b", "c")
    val out = df.select(
      Layout.zValueN(Seq(col("a"), col("b"), col("c")), 3))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 1L, 2L, 4L, 43L, 511L))
    // the SQL twin computes the identical codes (pinned through Spark,
    // same >> & << + operators as DuckDB)
    val sql = Layout.zValueSqlN(Seq("a", "b", "c"), 3)
    val viaSql = df.selectExpr(s"$sql AS z")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == out)
    // int inputs widen to long before shifting: positions >= 32 intact
    val wide = Seq((1, 0, 1)).toDF("a", "b", "c")
      .select(Layout.zValueN(
        Seq(col("a") * 2048, col("b"), col("c") * 2048), 12))
      .collect().head.getLong(0)
    // a bit 11 -> pos 33; c bit 11 -> pos 35
    assert(wide == (1L << 33) + (1L << 35))
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
