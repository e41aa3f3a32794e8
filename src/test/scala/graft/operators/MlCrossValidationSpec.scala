package graft.operators

import graft.SparkSpec
import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-validation against an independent implementation: spark.ml's
  * MinHashLSH (seeded) must agree with graft's deterministic LSH about
  * which documents are near-duplicates on a corpus with known structure.
  * (graft's own pipeline is md5-salt deterministic — no RNG — which is
  * why it, not spark.ml, is the oracle-checked production path.) */
class MlCrossValidationSpec extends SparkSpec {

  test("spark.ml MinHashLSH confirms graft's near-dup pairs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog by the river bank"),
      (3L, "a quick brown fox jumps over the lazy dog by the river shore"),
      (4L, "catalyst plans whole stage codegen for shuffle free execution"),
      (5L, "completely different text about training data pipelines"))
      .toDF("doc_id", "text")

    // ground truth + graft's candidates
    val truePairs = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val graftPairs = Dedup.lshCandidates(corpus)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // spark.ml pipeline over the same shingles
    val shingled = corpus.select(col("doc_id"),
      array_distinct(TextAnalysis.shingles(
        TextAnalysis.tokens(col("text")), 3)).as("sh"))
    val vectorized = new CountVectorizer()
      .setInputCol("sh").setOutputCol("features")
      .fit(shingled).transform(shingled)
    val model = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
      .fit(vectorized)
    // approxSimilarityJoin post-filters by TRUE Jaccard distance, so its
    // output is (candidates ∩ truth) — compare against truth directly
    val mlPairs = model
      .approxSimilarityJoin(vectorized, vectorized, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truePairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // containment, not equality: approxSimilarityJoin is exact-filtered
    // but candidate generation is probabilistic (seeded), and its
    // boundary is strict (< distance) vs jaccardPairs' inclusive (>=)
    assert(mlPairs.subsetOf(truePairs),
      s"spark.ml found false pairs: ${mlPairs -- truePairs}")
    assert(mlPairs.contains((1L, 2L)),
      s"J=1 pair missing from spark.ml result $mlPairs")
    // banded LSH recall: identical docs (J=1) collide in EVERY band, so
    // (1,2) is guaranteed; J≈0.65 pairs are probabilistic at 4 bands x 3
    // rows (P≈0.72) — that's the precision/recall dial, not a bug
    assert(graftPairs.contains((1L, 2L)),
      s"guaranteed J=1 pair missing from $graftPairs")
    assert(graftPairs.subsetOf(truePairs ++ Set((1L, 2L))),
      s"graft candidates $graftPairs contain false pairs beyond truth")
    // more, narrower bands (12 x 1) trade precision for recall:
    // P(candidate) = 1-(1-J)^12 ≈ 1 for J >= 0.65 -> all true pairs
    val highRecall = Dedup.lshCandidates(corpus, k = 12, rowsPerBand = 1)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(highRecall),
      s"12x1 banding $highRecall should cover $truePairs")
  }
}
