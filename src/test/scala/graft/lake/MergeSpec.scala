package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CDC merge semantics: upsert replace/insert, delete application,
  * feed compaction, and SCD-2 chain integrity. */
class MergeSpec extends SparkSpec {

  import spark.implicits._

  private def base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "status", "price")

  test("upsert replaces matched keys and inserts unmatched ones") {
    val updates = Seq((2L, "B", 22.0), (9L, "i", 90.0))
      .toDF("k", "status", "price")
    val out = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "i"))
  }

  test("applyChanges deletes 'D' keys and upserts the rest") {
    val changes = Seq((1L, null.asInstanceOf[String], 0.0, "D"),
      (3L, "C", 33.0, "U"), (4L, "d", 40.0, "I"))
      .toDF("k", "status", "price", "op")
    val out = Merge.applyChanges(base, changes, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(2L -> "b", 3L -> "C", 4L -> "d"))
  }

  test("latestByKey keeps exactly the highest-version change per key") {
    val feed = Seq((1L, 1L, "old"), (1L, 3L, "new"), (1L, 2L, "mid"),
      (2L, 7L, "only")).toDF("k", "lsn", "v")
    val out = Merge.latestByKey(feed, Seq("k"), col("lsn"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq(1L -> "new", 2L -> "only"))
  }

  test("schema evolution: feed-only columns widen the table, base rows null") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val feed = Seq((2L, Option("B"), Option("web"), "U"),
      (3L, None: Option[String], None: Option[String], "D"),
      (4L, Option("d"), Option("api"), "I"))
      .toDF("k", "v", "channel", "op")
    val out = Merge.applyChanges(base, feed, Seq("k"),
      evolveSchema = true).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(out == Seq((1L, "a", None), (2L, "B", Some("web")),
      (4L, "d", Some("api"))))
    // without opting in, the widened feed must fail analysis loudly
    intercept[org.apache.spark.sql.AnalysisException] {
      Merge.applyChanges(base, feed, Seq("k"))
    }
  }

  test("scd2History versions chain: valid_to = next valid_from, one current per key") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val hist = Merge.scd2History(
      events.select("user_id", "event_id", "value", "ts"),
      Seq("user_id"), col("ts"), col("event_id"))
    // exactly one open (is_current) version per key
    val open = hist.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(open == 0, "every key must have exactly one current version")
    // no overlap/gap: each closed version's valid_to equals some version's
    // valid_from of the same key, and closed count = versions - 1
    val perKey = hist.groupBy("user_id").agg(
      count(lit(1)).as("n"), count(col("valid_to")).as("closed"))
    assert(perKey.filter(col("closed") =!= col("n") - 1).count() == 0)
  }
}
