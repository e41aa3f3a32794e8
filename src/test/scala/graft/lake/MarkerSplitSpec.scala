package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Edge cases of the reference's split semantics
  * (IngestionService.java:55-60,108-132) — SURVEY §5 item 1. */
class MarkerSplitSpec extends SparkSpec {

  private val The = MarkerSplit.StartMarkers(0)
  private val This = MarkerSplit.StartMarkers(1)
  private val EndThe = MarkerSplit.EndMarkers(0)
  private val EndThis = MarkerSplit.EndMarkers(1)

  private def split(text: String): Row = {
    import spark.implicits._
    MarkerSplit.withSplit(Seq((1L, text)).toDF("id", "text"))
      .select("split_ok", "header", "body").head()
  }

  test("THE variant: header keeps the marker, body is between markers") {
    val r = split(s"intro\n$The X ***\nBODY TEXT\n$EndThe X ***\ntail")
    assert(r.getBoolean(0))
    // s points AFTER the start marker -> header includes it (ref :59)
    assert(r.getString(1) == s"intro\n$The")
    assert(r.getString(2) == "X ***\nBODY TEXT")
  }

  test("THIS variant is recognized") {
    val r = split(s"pre $This ***\nbody\n$EndThis ***")
    assert(r.getBoolean(0))
    assert(r.getString(1).endsWith(This))
    assert(r.getString(2) == "***\nbody")
  }

  test("missing start marker rejects") {
    val r = split(s"no start here\n$EndThe ***")
    assert(!r.getBoolean(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("missing end marker rejects") {
    val r = split(s"$The ***\nbody only")
    assert(!r.getBoolean(0))
  }

  test("end before start rejects (e <= s)") {
    val r = split(s"$EndThe ***\nthen\n$The ***")
    assert(!r.getBoolean(0))
  }

  test("plain text with no markers rejects") {
    assert(!split("just some plain text").getBoolean(0))
  }

  test("last end marker wins when several occur") {
    val r = split(s"$The\nbody A\n$EndThe\nbody B\n$EndThe\nfin")
    assert(r.getBoolean(0))
    assert(r.getString(2) == s"body A\n$EndThe\nbody B")
  }

  test("earliest start marker wins when both variants occur") {
    val r = split(s"$This first\n$The second\nbody\n$EndThe")
    assert(r.getBoolean(0))
    // THIS occurs first -> header ends with THIS, body starts after it
    assert(r.getString(1) == This)
    assert(r.getString(2) == s"first\n$The second\nbody")
  }

  test("whitespace (incl newlines) trimmed from header and body") {
    val r = split(s"  \n$The \n\t body \n\r $EndThe")
    assert(r.getBoolean(0))
    assert(r.getString(1) == The)
    assert(r.getString(2) == "body")
  }
}
