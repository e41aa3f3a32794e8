package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** l19/l20: the round trip must reproduce the hardened original
  * row-for-row (a stronger check than the published hash columns),
  * including on crafted pathological text the fixture corpus never
  * contains. */
class FormatFidelitySpec extends SparkSpec {

  import spark.implicits._

  private def pathological = Seq(
    (1L, "plain words only", "en", "s0"),
    (2L, "embedded\nnewline and \"doubled\" quotes", "en", "s0"),
    (3L, "comma,separated,and a trailing backslash\\", "de", "s1"),
    (4L, "tab\there + unicode é世界", "ja", "s1"),
    (5L, "quote at end\"", "en", "s2"),
    (6L, "\"starts quoted\" and\nsplits\nthrice", "en", "s2"),
    // edge whitespace: the CSV writer's ignore*WhiteSpace defaults
    // trim these silently — the r18 advice finding
    (7L, "  leading spaces and trailing  ", " en ", "s3"),
    (8L, "\tstarts with a tab", "en", "s3"),
    // empty string fields must survive as "", not collapse to null
    (9L, "text\nwith body", "", "s4"),
    // percent signs exercise the l21 encode/decode (% is its escape)
    (10L, "100% done%0Anot a newline %25 literal", "en", "s4")
  ).toDF("doc_id", "text", "lang", "source")

  private def expected(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("lang"), col("source"),
      length(concat(col("text"), lit(FormatFidelity.HardSuffix)))
        .cast("long").as("rt_chars"),
      md5(concat(col("text"), lit(FormatFidelity.HardSuffix)))
        .as("text_md5"))
    .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq

  test("JSONL round trip is byte-exact on pathological text") {
    val got = FormatFidelity.jsonlRoundTrip(pathological)
      .collect().map(_.toSeq).toSeq
    assert(got == expected(pathological))
  }

  test("CSV (RFC-4180 posture) round trip is byte-exact on " +
      "pathological text") {
    val got = FormatFidelity.csvRoundTrip(pathological)
      .collect().map(_.toSeq).toSeq
    assert(got == expected(pathological))
  }

  test("splittable CSV (l21, percent-encoded line structure) round " +
      "trip is byte-exact on pathological text") {
    val got = FormatFidelity.csvSplittableRoundTrip(pathological)
      .collect().map(_.toSeq).toSeq
    assert(got == expected(pathological))
  }

  test("the hard suffix carries every hazard class it claims") {
    val s = FormatFidelity.HardSuffix
    assert(s.contains("\n") && s.contains(",") && s.contains("\"") &&
      s.contains("\\") && s.contains("\t") && s.exists(_ > 127))
  }

  test("fixture round trips agree with each other and the ground " +
      "truth (format-independent identity)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val j = FormatFidelity.jsonlRoundTrip(docs).collect().map(_.toSeq)
    val c = FormatFidelity.csvRoundTrip(docs).collect().map(_.toSeq)
    val sp = FormatFidelity.csvSplittableRoundTrip(docs)
      .collect().map(_.toSeq)
    assert(j.nonEmpty && j.toSeq == c.toSeq)
    assert(j.toSeq == sp.toSeq)
    assert(j.toSeq == expected(docs))
  }

  test("l21's stored files are genuinely ONE LINE PER RECORD (the " +
      "splittability claim, proven on the raw bytes)") {
    val docs = pathological
    // a raw line-oriented read of the stored directory must see
    // exactly one line per document — embedded newlines survived the
    // percent encoding, CRs included (a stray CR/LF would split a
    // record and break any byte-range task assignment)
    FormatFidelity.csvSplittableRoundTrip(docs).collect(): Unit
    val lines = spark.read.text(FormatFidelity.splittableCsvDir(docs))
      .count()
    assert(lines == docs.count(),
      s"expected ${docs.count()} physical lines, raw read saw $lines")
  }

  test("the percent encode/decode pair is lossless on adversarial " +
      "strings (token-boundary soundness)") {
    // strings whose ENCODED forms contain lookalike token text:
    // literal %0A, literal %25, % followed by 0A, stacked escapes
    val hard = Seq((1L, "%0A", "x", "s"), (2L, "%25", "x", "s"),
      (3L, "%%0A%", "x", "s"), (4L, "\n%0A\n%25%", "x", "s"),
      (5L, "%250A", "x", "s"), (6L, "\r\n mixed \r and % ends%", "x", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = FormatFidelity.csvSplittableRoundTrip(hard)
      .collect().map(_.toSeq).toSeq
    assert(got == expected(hard))
  }
}
