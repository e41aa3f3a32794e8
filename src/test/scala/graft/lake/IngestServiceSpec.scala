package graft.lake

import java.time.LocalDateTime

import graft.SparkSpec

/** E1 end-to-end (fetch -> split -> save) with a fixture fetcher standing
  * in for gutenberg.org (the reference's HTTP source,
  * IngestionService.java:43-53) — SURVEY §5's t1 vertical slice. */
/** Top-level (not nested in the suite): fetchers ship to executors, and a
  * nested object would drag the non-serializable suite along as $outer. */
object FixtureFetcher extends DocumentFetcher {
  private val The = MarkerSplit.StartMarkers(0)
  private val EndThe = MarkerSplit.EndMarkers(0)
  override def fetch(id: Long): Option[String] = id match {
    case 1L => Some(s"Title One\n$The ***\nbody one\n$EndThe ***\nfin")
    case 2L => Some(s"Title Two\n$The ***\nbody two\n$EndThe ***\nfin")
    case 3L => Some("malformed - no markers")
    case _  => None // download failure
  }
}

class IngestServiceSpec extends SparkSpec {

  private val ts = LocalDateTime.of(2026, 5, 1, 12, 0, 0)

  test("ingest: valid docs land in the lake, failures get statuses") {
    val storage = new InMemoryLakeStorage(spark)
    val service = new IngestService(spark, storage, FixtureFetcher)
    val report = service.ingest(Seq(-5L, 1L, 2L, 3L, 42L), ts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(report == Map(
      -5L -> "invalid_book_id",
      1L -> "downloaded",
      2L -> "downloaded",
      3L -> "marker_split_failed",
      42L -> "download_failed"))

    assert(storage.listBooks() == Seq(1L, 2L))
    assert(storage.exists(1L) && !storage.exists(3L) && !storage.exists(42L))
    val body1 = storage.lake.filter("book_id = 1 and kind = 'body'")
      .select("text").head().getString(0)
    assert(body1 == "***\nbody one")
  }

  test("gutenberg URL shape matches the reference (IngestionService.java:46)") {
    assert(GutenbergFetcher.url(1342) ==
      "https://www.gutenberg.org/cache/epub/1342/pg1342.txt")
  }

  test("datalake move failure surfaces the reference's 500 status " +
    "(Main.java:107-110); per-row failures keep their own codes") {
    val storage = new InMemoryLakeStorage(spark) {
      override def saveBooks(books: org.apache.spark.sql.DataFrame,
          at: LocalDateTime): Unit =
        throw new RuntimeException("simulated datalake outage")
    }
    val service = new IngestService(spark, storage, FixtureFetcher)
    val report = service.ingest(Seq(-5L, 1L, 3L, 42L), ts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(report == Map(
      -5L -> "invalid_book_id",
      1L -> "datalake_move_failed",
      3L -> "marker_split_failed",
      42L -> "download_failed"))
    assert(storage.listBooks().isEmpty)
  }

  test("status report covers the reference's full vocabulary " +
    "(Main.java:100-123) and is computed without a driver collect") {
    val service =
      new IngestService(spark, new InMemoryLakeStorage(spark), FixtureFetcher)
    val report = service.ingest(Seq(-5L, 1L, 3L, 42L), ts)
    // still a DataFrame: usable as a distributed input downstream
    assert(report.columns.toSeq == Seq("book_id", "status"))
    val statuses = report.select("status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses == Set("invalid_book_id", "downloaded",
      "marker_split_failed", "download_failed"))
  }
}
