package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The trained mixture (p19 → p20) applied AT INTAKE — the streaming
  * face of [[graft.operators.Sampling.mixtureManifest]]: once the
  * multiplicative-weights optimizer has produced per-source sampling
  * thresholds, ingest should enforce them on every arriving document so
  * the landed corpus IS the optimized mixture, instead of landing
  * everything and re-sampling in batch (double storage, and the mix
  * drifts between refreshes).
  *
  * The gate is STATELESS by construction — the decision is one md5
  * prefix against a per-source threshold literal, the same
  * deterministic draw as batch (no RNG, no state store), so:
  *  - stream/batch parity is bitwise (spec-asserted): a document is
  *    kept in-stream iff p20's batch manifest keeps it;
  *  - replays/restarts keep the SAME documents (exactly-once selection
  *    without any dedup state);
  *  - the threshold map is a model artifact (|sources| entries),
  *    rendered as a literal map — broadcast scale by nature, the same
  *    argument as the corpus gate's benchmark shingles.
  *
  * Unknown sources (not in the trained map) are REJECTED — a mixture
  * that silently admits an untrained source is how a curated corpus
  * drifts; route new sources through the trainer first. */
object StreamingMixtureGate {

  /** The p20 threshold artifact as a literal map column. */
  def thresholdMap(thresholds: Map[String, String]): Column =
    map(thresholds.toSeq.sortBy(_._1)
      .flatMap { case (s, t) => Seq(lit(s), lit(t)) }: _*)

  /** Keep each arriving document iff its deterministic draw falls under
    * its source's trained threshold ("g" = keep-all, the t16/p20 rate≥1
    * rendering; absent source = reject). Works identically on a
    * streaming or batch frame — there is no state to diverge. */
  def mixtureGateStream(documents: DataFrame,
      thresholds: Map[String, String]): DataFrame =
    documents
      .withColumn("_thr",
        element_at(thresholdMap(thresholds), col("source")))
      .filter(col("_thr").isNotNull &&
        graft.operators.Sampling.sampleKey(col("doc_id")) < col("_thr"))
      .drop("_thr")
}
