package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus intake — the continuous face of p04's front
  * stages: each arriving document passes the quality gate, benchmark
  * decontamination, in-stream exact dedup, and dedup against the
  * already-landed corpus, so what reaches the sink is ready for the
  * (inherently batch) budget/mix stage.
  *
  * Stage shapes, chosen so the stream stays one stateful operator:
  *  - quality gate: [[graft.operators.TextAnalysis.qualityExpr]] is a
  *    pure scan-stage expression — stateless.
  *  - decontamination: the benchmark shingle set rides as a LITERAL
  *    array and the check is one `arrays_overlap` per row — stateless,
  *    and honest at scale because benchmark suites are small by nature
  *    (the same broadcast argument as batch p02). Semantics match
  *    p02's exact postings: ANY shared 3-gram poisons, and the <3-token
  *    whole-text fallback is the shared [[graft.functions.TextFns
  *    .wordShingles]] contract.
  *  - in-stream dedup: watermark-bounded
  *    `dropDuplicatesWithinWatermark` on the content digest
  *    ([[StreamingDedup]]'s contract — state can't grow unbounded).
  *  - corpus dedup: stream-static LEFT ANTI join against the digest
  *    index ([[graft.operators.Dedup.incrementalExactDedup]]'s index
  *    side; at rest a bucketed table, so the join is exchange-free on
  *    the static side).
  */
object StreamingCorpusGate {

  /** The benchmark shingle set as a literal column (benchmark-suite
    * sized — broadcast scale by nature). */
  def benchShingleArray(benchShingles: Seq[String]): Column =
    array(benchShingles.map(lit): _*)

  /** `requireGopher = true` adds the FULL t35 Gopher rule set as a
    * stateless per-row gate ([[graft.operators.TextAnalysis
    * .gopherKeepExpr]] — the page render and every rule aggregate as
    * higher-order array expressions, batch-parity spec'd), so the
    * structural-quality cut a batch pipeline runs first (p08's gate
    * order) happens at intake too, before anything pays dedup state. */
  def corpusGateStream(documents: DataFrame, digestIndex: DataFrame,
      benchShingles: Seq[String], minQuality: Double = 0.5,
      eventTimeCol: String = "ts",
      watermark: String = "1 hour",
      requireGopher: Boolean = false): DataFrame = {
    val shingles = array_distinct(
      graft.functions.TextFns.wordShingles(col("text"), 3))
    val gated =
      if (requireGopher)
        documents.filter(graft.operators.TextAnalysis
          .gopherKeepExpr(col("doc_id"), col("text")))
      else documents
    gated
      .withColumn("quality",
        graft.operators.TextAnalysis.qualityExpr(col("text")))
      .filter(col("quality") >= minQuality)
      .filter(!arrays_overlap(shingles,
        benchShingleArray(benchShingles)))
      .withColumn("content_md5",
        graft.operators.Dedup.contentDigest(col("text")))
      .join(digestIndex.select(col("content_md5")),
        Seq("content_md5"), "left_anti")
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_md5")
  }
}
