package graft.lake

import java.time.LocalDateTime

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 item 2): split recovery and
  * ingest round-trip, driven by seeded ScalaCheck generators (the
  * scalatest/scalacheck bridge isn't in the offline cache, so cases are
  * sampled explicitly — deterministic seeds, Spark-job-sized case counts). */
class LakePropertySpec extends SparkSpec {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i =>
      gen.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)))

  private val plainText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(" "),
      Gen.const("\n"))).map(_.mkString.take(200))
      .suchThat(!_.contains("*** "))

  test("property: wrap-with-markers then split recovers the parts") {
    import spark.implicits._
    val The = MarkerSplit.StartMarkers(0)
    val EndThe = MarkerSplit.EndMarkers(0)
    val cases = samples(Gen.zip(plainText, plainText), 8)
    assert(cases.nonEmpty)
    val df = cases.zipWithIndex.map { case ((pre, body), i) =>
      (i.toLong, pre, body,
        s"$pre\n$The title ***\n$body\n$EndThe title ***\nfin")
    }.toDF("id", "pre", "bod", "text")
    MarkerSplit.withSplit(df).collect().foreach { r =>
      val (pre, body) = (r.getAs[String]("pre"), r.getAs[String]("bod"))
      assert(r.getAs[Boolean]("split_ok"))
      // header = everything through the start marker, trimmed
      assert(r.getAs[String]("header") == s"$pre\n$The".trim)
      // body = post-marker to last-end-marker slice, trimmed
      assert(r.getAs[String]("body") == s"title ***\n$body".trim)
    }
  }

  test("property: ingest(ids) => exists(id) and list() is sorted distinct") {
    val The = MarkerSplit.StartMarkers(0)
    val EndThe = MarkerSplit.EndMarkers(0)
    val ts = LocalDateTime.of(2026, 6, 1, 8, 0)
    samples(Gen.nonEmptyListOf(Gen.choose(1L, 30L)), 5).foreach { ids =>
      val storage = new InMemoryLakeStorage(spark)
      val fetcher = new DocumentFetcher {
        override def fetch(id: Long): Option[String] =
          Some(s"doc $id\n$The ***\nbody of $id\n$EndThe ***")
      }
      // duplicate ids in the request: re-ingest stays idempotent for list()
      new IngestService(spark, storage, fetcher).ingest(ids ++ ids, ts)
      assert(storage.listBooks() == ids.distinct.sorted)
      ids.foreach(id => assert(storage.exists(id)))
      assert(!storage.exists(31L))
    }
  }
}
