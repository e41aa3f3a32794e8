package graft.sources

import graft.SparkSpec
import graft.lake.MarkerSplit
import org.apache.spark.sql.functions.col

/** DataSource V2 document source: fixture-mode reads, partition fan-out,
  * failure rows, and composition with the split pipeline. */
class GutenbergSourceSpec extends SparkSpec {

  private def read(ids: String, parts: Int = 3) =
    spark.read.format("graft.sources.GutenbergSource")
      .option("ids", ids)
      .option("numPartitions", parts.toString)
      .option("fetcher", "fixture")
      .load()

  test("reads one row per id with the declared schema") {
    val df = read("5, 7, 11, 13")
    assert(df.schema.fieldNames.toSeq == Seq("book_id", "text"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.keySet == Set(5L, 7L, 11L, 13L))
    assert(rows(7L).contains("fixture body of book 7"))
  }

  test("ids spread across the requested number of partitions") {
    val df = read("1,2,3,4,5,6,7,8", parts = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 8)
  }

  test("invalid ids surface as null text (download_failed semantics)") {
    val df = read("-3, 9")
    val byId = df.collect().map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(byId(-3L).isEmpty && byId(9L).isDefined)
  }

  test("composes with the marker-split pipeline end to end") {
    val split = MarkerSplit.withSplit(read("21, 22"))
    val bodies = split.filter(col("split_ok"))
      .select("book_id", "body").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bodies.keySet == Set(21L, 22L))
    assert(bodies(21L).endsWith("fixture body of book 21"))
  }

  test("unknown fetcher and missing ids are rejected") {
    intercept[Exception] {
      spark.read.format("graft.sources.GutenbergSource")
        .option("ids", "1").option("fetcher", "carrier-pigeon").load()
        .collect()
    }
    intercept[Exception] {
      spark.read.format("graft.sources.GutenbergSource").load().collect()
    }
  }
}
