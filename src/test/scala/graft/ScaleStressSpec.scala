package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-only synthetic scale-up: every row becomes `factor` rows with
  * perturbed identity so the DATA grows ×factor but its structure does
  * not degenerate (replicated ids would collapse dedup into giant
  * all-duplicate groups and measure that artifact, not the operator). */
object ScaledTables {

  /** Explode-based ×factor with id re-keying (`id*factor + rep` keeps
    * re-keyed spaces disjoint and FK pairs scaled in lockstep when both
    * sides use the same formula) and optional text/vector perturbation. */
  def scaled(df: DataFrame, factor: Int, idCols: Seq[String],
      textCols: Seq[String] = Nil, vecCols: Seq[String] = Nil): DataFrame = {
    val rep = df.withColumn("_rep",
      explode(sequence(lit(0L), lit(factor - 1L))))
    val withIds = idCols.foldLeft(rep)((d, c) =>
      d.withColumn(c, col(c) * factor + col("_rep")))
    // per-replica token-BIJECTIVE renaming (every token suffixed with the
    // rep index): within one replica the fixture's whole shingle/Jaccard
    // pair structure is preserved EXACTLY (equal shingles stay equal,
    // distinct stay distinct), while replicas share zero shingles with
    // each other — so near-dup PAIRS grow ×factor, not ×factor². The
    // earlier trailing-suffix variant left all replicas of a doc mutual
    // near-dups: posting lists octupled and the uncapped inverted-index
    // self-join saw ×64 — the ×8 run then measured that synthetic
    // duplication blowup, not the operator (d11 hit ×31 at sf0.1×8).
    // This is the text analogue of the vector dim-0 shove below.
    val withText = textCols.foldLeft(withIds)((d, c) =>
      d.withColumn(c, array_join(
        transform(split(trim(col(c)), "\\s+"),
          t => concat(t, lit("z"), col("_rep"))), " ")))
    // shove dimension 0 per replica: replicas land in different LSH/IVF
    // cells and stop being mutual near-dups, keeping pair density linear
    val withVec = vecCols.foldLeft(withText)((d, c) =>
      d.withColumn(c, expr(
        s"transform($c, (x, i) -> IF(i = 0, CAST(x + _rep * 7.5 AS FLOAT), x))")))
    withVec.drop("_rep")
  }
}

/** The local answer to "would this survive 100×": run the most
  * expensive ledger operators on the fixture and on a ×8 synthetic
  * scale-up, assert wall time grows at most ~linearly (generous bound —
  * a quadratic shape would show ~64×) and that the scaled plans pick up
  * no cartesian/nested-loop shapes. Runs in-rig against sf0.001 by
  * default; point GRAFT_STRESS_SF at /root/testdata/sf0.1 for the full
  * heavyweight variant (the FS-test env pattern).
  *
  * Literal plan equality is deliberately NOT asserted: a join that
  * broadcasts at fixture size and sort-merges at ×8 is the optimizer
  * doing its job, not a regression — the invariants that must hold at
  * any size are the absence of unbounded shapes and ≲linear growth.
  *
  * Growth factors are additionally ratcheted against committed history
  * (STRESS_FACTORS.json): each observed ×8 factor must stay within 1.5×
  * of its recorded value (+1.0 absolute fixture-noise allowance), so a
  * plan regression that stays under the generous linear bound — e.g. a
  * broadcast flipping to a quadratic-ish shape only at scale — still
  * fails even though absolute times drift between rigs. Re-baseline
  * deliberately with GRAFT_STRESS_RECORD=1. */
class ScaleStressSpec extends SparkSpec {

  private val sf = sys.env.getOrElse("GRAFT_STRESS_SF",
    "/root/testdata/sf0.001")
  /** Synthetic scale multiplier. Default ×8; GRAFT_STRESS_FACTOR=64
    * runs the same harness at ×64 — the r18 verdict's demand after
    * q26's quadratic regime hid inside the ×8 window for two rounds
    * (a small-constant n² term can pass ×8's generous bound and still
    * detonate at ×64: quadratic shows ~×4096 there, unmissable).
    * Non-default factors record under "<sf>@x<factor>/" keys in
    * STRESS_FACTORS.json so the ×8 ratchet history stays intact. */
  private val factor = sys.env.get("GRAFT_STRESS_FACTOR").map { v =>
    require(v.matches("[1-9][0-9]*"),
      s"GRAFT_STRESS_FACTOR must be a positive integer, got '$v'")
    v.toInt
  }.getOrElse(8)

  import graft.operators.{Dedup => D, Similarity => S, DataQuality => DQ,
    TextAnalysis => T, Windows => W}

  private def docs = Tables.documents(spark, sf)
  private def emb = Tables.embeddings(spark, sf)
  private def docsX = ScaledTables.scaled(docs, factor,
    idCols = Seq("doc_id"), textCols = Seq("text"))
  /** m05's ×8 fixture: perceptual-identity perturbation (per-replica
    * block-grid shift via a per-doc reversed-prefix tail) instead of
    * the token rename, which blockhash is invariant to — see the m05
    * entry comment below. */
  private def docsXPerc = docs
    .withColumn("_rep", explode(sequence(lit(0L), lit(factor - 1L))))
    .withColumn("doc_id", col("doc_id") * factor + col("_rep"))
    .withColumn("text", expr("concat(text, substr(reverse(text), 1, " +
      "CAST(_rep * ((length(text) + 31) div 32) AS INT)))"))
    .drop("_rep")
  private def embX = ScaledTables.scaled(emb, factor,
    idCols = Seq("vec_id"), vecCols = Seq("embedding"))

  /** Min of two timed runs (the bench's jitter-proofing, in miniature):
    * co-load and GC pauses only ever slow a run down, and a shrunk
    * single-shot baseline t1 is exactly what flaked the r9 ratio — the
    * min of two runs has to be hit twice to distort. */
  private def time(df: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  private val heavySet: Seq[(String, DataFrame, DataFrame, Boolean)] = Seq(
    // (name, baseline, scaled, nested-loop intended)
    ("d07_dedup_clusters",
      D.dedupClusters(D.embeddingNearDups(emb)),
      D.dedupClusters(D.embeddingNearDups(embX)), false),
    // capped postings (the production default): the stress answers "does
    // the PRODUCTION path stay linear", the exact variant is oracle-only
    ("d12_containment",
      D.containmentPairs(docs), D.containmentPairs(docsX), false),
    ("d10_canonical_keep",
      D.canonicalKeepList(docs, D.dedupClusters(D.embeddingNearDups(emb))),
      D.canonicalKeepList(docsX, D.dedupClusters(D.embeddingNearDups(embX))),
      false),
    ("s08_ivf_trained_topk",
      S.ivfTrainedTopK(emb), S.ivfTrainedTopK(embX), true),
    ("d11_minhash_eval",
      D.minhashJaccardEval(docs), D.minhashJaccardEval(docsX), false),
    ("dq01_constraint_audit",
      DQ.constraintAudit(Tables.orders(spark, sf),
        Tables.lineitem(spark, sf)),
      DQ.constraintAudit(
        ScaledTables.scaled(Tables.orders(spark, sf), factor,
          idCols = Seq("o_orderkey")),
        ScaledTables.scaled(Tables.lineitem(spark, sf), factor,
          idCols = Seq("l_orderkey"))), false),
    // r11 additions: the new bench-ceiling queries. Two different
    // timing semantics, deliberate: s11/s12 are the END-TO-END forms —
    // s11 trains its PQ codebook entirely in-plan and s12 additionally
    // trains the codebook in-plan (only its coarse centroids
    // materialize at construction) — so their factors include training
    // cost. s15 (and s17 below) are the SERVING forms: both model
    // artifacts materialize at construction via ModelArtifacts, so
    // their factors isolate the serving plan — encode, LUT join, ADC
    // partial agg — the part that actually scales with the corpus.
    ("s11_pq_adc_topk",
      S.pqTopK(emb), S.pqTopK(embX), false),
    ("s12_ivfpq_topk",
      S.ivfPqTopK(emb), S.ivfPqTopK(embX), true),
    ("s15_ivfpq_serve",
      S.ivfPqTopKServe(emb), S.ivfPqTopKServe(embX), true),
    ("s17_ivfpq_rerank",
      S.ivfPqRerankTopK(emb), S.ivfPqRerankTopK(embX), true),
    // s18 had NO stress entry through r20 (the one drift the r20
    // verdict could not bound); append-form artifacts train on the
    // base split, so its factor covers freeze-encode-union serving
    ("s18_ivfpq_append",
      S.ivfPqAppendServe(emb), S.ivfPqAppendServe(embX), true),
    // d13's connected-components loop materializes (localCheckpoint)
    // at construction like d07/d10 above, so its factor covers the
    // post-CC labels projection; the banded candidate JOIN — the part
    // with quadratic failure modes — is stressed lazily as d04 below
    ("d13_lsh_clusters",
      D.dedupClusters(D.lshCandidates(docs),
        aCol = "doc_a", bCol = "doc_b"),
      D.dedupClusters(D.lshCandidates(docsX),
        aCol = "doc_a", bCol = "doc_b"), false),
    ("d04_lsh_candidates",
      D.lshCandidates(docs), D.lshCandidates(docsX), false),
    ("w19_open_shipments",
      W.openShipments(Tables.lineitem(spark, sf)),
      W.openShipments(ScaledTables.scaled(Tables.lineitem(spark, sf),
        factor, idCols = Seq("l_orderkey"))), false),
    // w23: per-type arrival-ordered running max + one tiny partial agg
    ("w23_watermark_lateness",
      W.watermarkLateness(Tables.events(spark, sf)),
      W.watermarkLateness(ScaledTables.scaled(Tables.events(spark, sf),
        factor, idCols = Seq("event_id"))), false),
    // r12 additions. s21 scales its CELL COUNT with the corpus (K ∝ N
    // keeps the expected cell size constant — the production lever its
    // scaladoc names; a fixed K would measure the deliberate per-cell
    // quadratic at ~×64, the workload's cost model, not a plan
    // regression)
    ("s21_knn_graph",
      S.knnGraph(emb, nCells = 32),
      S.knnGraph(embX, nCells = 32 * factor), true),
    // s47 scales its cell count with the corpus like s21; the scaled
    // side's top-2 assignment runs the pruned two-level path (no
    // brute cross) whenever 32·factor clears the PrunedAssignK
    // threshold, so bnljIntended=false doubles as that assertion —
    // at factor 1 the scaled side is below the threshold and the
    // brute cross is the intended plan
    ("s47_knn_graph_multi",
      S.knnGraphMulti(emb, nCells = 32),
      S.knnGraphMulti(embX, nCells = 32 * factor),
      32 * factor < graft.operators.Clustering.PrunedAssignK),
    // s43 rides the SHARED s21 graph (built eagerly at construction,
    // the d07/g04 semantics — the timed plan is the traversal + the
    // s01 exact side); cells scale with the corpus like s21 itself
    ("s43_graph_beam_recall",
      S.beamSearchRecall(emb),
      S.beamSearchRecall(embX, nCells = 32 * factor), true),
    // s44 reads every frontier of the same traversal (+3-row hop cross)
    ("s44_beam_hops_recall",
      S.beamSearchHopsRecall(emb),
      S.beamSearchHopsRecall(embX, nCells = 32 * factor), true),
    // s45: the at-rest graph table writes at construction (IndexStore,
    // d07 semantics); the timed plan is the PRUNED cell-partition scan
    // + traversal + exact side
    ("s45_stored_graph_serve",
      S.storedGraphBeamRecall(emb),
      S.storedGraphBeamRecall(embX, nCells = 32 * factor), true),
    // s46: s43's traversal + a label probe on the visited beam + the
    // prefilter-truth eval side (s26's intended query-batch cross)
    ("s46_filtered_beam_recall",
      S.filteredBeamRecall(emb),
      S.filteredBeamRecall(embX, nCells = 32 * factor), true),
    ("t32_repetition_profile",
      T.repetitionProfile(docs), T.repetitionProfile(docsX), false),
    // r12 continuation: g06 rides s21's graph (cells scale with the
    // corpus for the same reason), s22's ADC join is the corpus-linear
    // part of the SQ8 tier, t33 doubles t17's shuffle count
    ("g06_knn_triangles",
      graft.operators.Graph.knnTriangles(emb, nCells = 32),
      graft.operators.Graph.knnTriangles(embX, nCells = 32 * factor),
      true),
    ("s22_sq8_topk",
      S.sq8TopK(emb), S.sq8TopK(embX), false),
    // t33's ONE-row vocab-size frame is broadcast-crossed in (the
    // t17/t31 pattern) — that BNLJ is the intended shape
    ("t33_bigram_surprise",
      T.bigramSurprise(docs), T.bigramSurprise(docsX), true),
    // d16 joins the d04/d12 inverted-index family: the capped posting
    // self-join is exactly the shape with quadratic failure modes
    ("d16_substring_dups",
      D.substringDups(docs), D.substringDups(docsX), false),
    // r13 additions: the page-render gates are narrow-scan + doc-keyed
    // aggs (linear by construction — the ratchet guards the render's
    // explode fan-out); g07's posting self-join is the inverted-index
    // family's quadratic-failure shape, cells scaled with the corpus
    // like s21; s28 is s01's intended broadcast×scan with a role-keyed
    // bounded top-k
    ("t35_gopher_rules",
      T.gopherRules(docs), T.gopherRules(docsX), false),
    ("t36_c4_line_filter",
      T.c4LineFilter(docs), T.c4LineFilter(docsX), false),
    ("g07_shared_neighbors",
      graft.operators.Graph.sharedNeighborLinks(emb, nCells = 32),
      graft.operators.Graph.sharedNeighborLinks(embX,
        nCells = 32 * factor), true),
    ("s28_hard_negatives",
      S.hardNegativeMining(emb), S.hardNegativeMining(embX), true),
    // d17's prefix self-join is the exact-join answer to d04/d12's
    // capped postings — the shape whose whole point is staying
    // sub-quadratic as boilerplate grows
    ("d17_ppjoin_pairs",
      D.ppjoinPairs(docs), D.ppjoinPairs(docsX), false),
    // r13 continuation: the round's remaining training-heavy forms.
    // s30/s32 are END-TO-END (in-plan coarse+PQ training — the s11/s12
    // timing semantics); k04 runs the trainer twice; g08's factor
    // isolates the walk joins over the (cells ∝ corpus) kNN graph
    ("s30_ivfpq_residual",
      S.ivfPqResidualTopK(emb), S.ivfPqResidualTopK(embX), true),
    ("s32_opq_pq_topk",
      S.opqPqTopK(emb), S.opqPqTopK(embX), false),
    ("k04_cluster_agreement",
      graft.operators.Clustering.clusterAgreement(emb),
      graft.operators.Clustering.clusterAgreement(embX), true),
    // k05: one broadcast-cross + two partial aggs; the cross is the
    // intended tiny-side BNLJ (k01's timing semantics, training cost
    // included via trainedCentroidsLocal at construction)
    ("k05_silhouette",
      graft.operators.Clustering.simplifiedSilhouette(emb),
      graft.operators.Clustering.simplifiedSilhouette(embX), true),
    // s40: k01 training at construction semantics; the re-assignment
    // touches hot members only; 1-row metric crosses intended
    ("s40_cell_split",
      graft.operators.Clustering.hotCellSplit(emb),
      graft.operators.Clustering.hotCellSplit(embX), true),
    ("g08_graph_walks",
      graft.operators.Graph.deterministicWalks(emb),
      graft.operators.Graph.deterministicWalks(embX,
        nCells = 32 * factor), true),
    // g09: modularity over the (cells ∝ corpus) kNN graph — the edge
    // joins and cell-keyed aggs are the scaling surface; 1-row metric
    // crosses are the intended BNLJ
    ("g09_cell_modularity",
      graft.operators.Graph.cellModularity(emb),
      graft.operators.Graph.cellModularity(embX, nCells = 32 * factor),
      true),
    // r14 additions: the remaining bench-top queries without entries.
    // s31/s33 are recall EVALS — each runs two serving tiers plus the
    // s01 brute-force ground truth (the intended broadcast×scan, hence
    // bnljIntended); their factor covers the full eval pipeline.
    ("s31_residual_recall",
      S.residualRecall(emb), S.residualRecall(embX), true),
    ("s33_opq_recall",
      S.opqRecall(emb), S.opqRecall(embX), true),
    // k03 trains four K tiers end-to-end (each a broadcast-cross
    // assign — the k01/k04 timing semantics, training cost included)
    ("k03_elbow_curve",
      graft.operators.Clustering.elbowCurve(emb),
      graft.operators.Clustering.elbowCurve(embX), true),
    // p08 composes the gopher/c4/ppl gates; the ppl tercile carries
    // the t17-style ONE-row corpus frame broadcast-cross (whitelisted
    // in the plan audit, intended here)
    ("p08_curated_corpus",
      T.curatedCorpusV2(docs), T.curatedCorpusV2(docsX), true),
    // r14 second batch: the round's new ledger rows. s36 is a SERVING
    // form (stored table + artifacts materialize at construction —
    // the s15/s17 timing semantics); s37 is END-TO-END like s32; s38
    // is a recall eval with the s01 exact side (hence bnljIntended);
    // d18 is two canon-keyed shuffles; t42 carries t33's one-row
    // corpus-frame cross
    ("s36_index_lifecycle",
      S.ivfPqLifecycleServe(emb), S.ivfPqLifecycleServe(embX), true),
    ("s37_rotated_pq",
      S.rotatedPqTopK(emb), S.rotatedPqTopK(embX), false),
    ("s38_rotation_recall",
      S.rotationRecall(emb), S.rotationRecall(embX), true),
    ("d18_url_dedup",
      D.urlDedup(docs), D.urlDedup(docsX), false),
    ("t42_lm_perplexity",
      T.smoothedLmScore(docs), T.smoothedLmScore(docsX), true),
    // r15 additions. t43 TRAINS at construction (8 driver-argmax
    // rounds — the d07/d13 materialize-at-construction semantics) and
    // the timed plan is the encode: vocab replay + broadcast join back
    // to the corpus. p10's incremental path is index joins + the p05
    // band screen; p11 composes p07's features (t17's one-row corpus
    // cross rides along — intended); s39 is s38's eval shape plus one
    // scan-stage transform (the s01 exact side → bnljIntended).
    ("t43_bpe_encode", {
      val m = T.bpeTrain(docs, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.bpeEncode(docs, m)
    }, {
      val mX = T.bpeTrain(docsX, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.bpeEncode(docsX, mX)
    }, false),
    ("p10_incremental_corpus",
      T.incrementalCorpusBuild(docs), T.incrementalCorpusBuild(docsX),
      false),
    // r16: t46 longest-match encode (t43's constant-depth twin: the
    // timed plan is the position-window explode + broadcast symbol
    // join + one fold, vocab-scale) and t47 round trip (one ordered
    // corpus tokenize + broadcast decode map + doc-keyed reassembly)
    ("t46_bpe_longest_match", {
      val m = T.bpeTrain(docs, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.bpeLongestMatchEncode(docs, m)
    }, {
      val mX = T.bpeTrain(docsX, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.bpeLongestMatchEncode(docsX, mX)
    }, false),
    // t50 unigram-LM trainer: the EM vocab collects run eagerly at
    // construction (d07/g04 semantics); the timed plan is the final
    // longest-match segmentation + usage agg + 1-row total cross
    ("t50_unigram_train",
      T.unigramTrain(docs), T.unigramTrain(docsX), true),
    // p15: d04's banded candidate join (exchange-reused, d11-capped)
    // + two source-attribution joins + sources² aggregation
    ("p15_source_overlap",
      D.sourceOverlapMatrix(docs), D.sourceOverlapMatrix(docsX), false),
    // r16 ratchet extension: every bench query above ~2 s at sf0.1 now
    // carries a factor. q23/q26 are lineitem percentile funnels — q26's
    // old ×8 of 12.2–13.9 was the accuracy-1M sketch sitting entirely
    // inside the Greenwald–Khanna QUADRATIC regime (n(group) < accuracy
    // retains every sample; compress walks the whole buffer): the r18
    // adjudication pins accuracy at 2^17, still exact at the sf0.01
    // oracle fixture (rank error 20046/131072 < 1 row) but past the
    // retention cap at sf0.1×8, so the recorded factor is the linear
    // bounded-memory path — the crossover is derived and measured in
    // approxPercentiles' scaladoc. p04
    // composes the corpus gates; d14 is the tight-capped containment
    // path; s14/s16/s23 are recall/diversify evals on the cached
    // serving forms (s01-style exact sides → bnljIntended); dq06 scales
    // all three audited tables in lockstep; g04's power iteration runs
    // eagerly at construction (d07 semantics), the timed plan is the
    // anchored serve tail.
    ("q23_percentiles",
      graft.operators.Relational.percentiles(Tables.lineitem(spark, sf)),
      graft.operators.Relational.percentiles(ScaledTables.scaled(
        Tables.lineitem(spark, sf), factor, idCols = Seq("l_orderkey"))),
      false),
    ("q26_approx_percentiles",
      graft.operators.Relational.approxPercentiles(
        Tables.lineitem(spark, sf)),
      graft.operators.Relational.approxPercentiles(ScaledTables.scaled(
        Tables.lineitem(spark, sf), factor, idCols = Seq("l_orderkey"))),
      false),
    ("p04_pretrain_corpus",
      T.pretrainCorpusBuild(docs), T.pretrainCorpusBuild(docsX), false),
    ("p07_quality_features",
      T.qualityFeatures(docs), T.qualityFeatures(docsX), true),
    ("d14_containment_capped",
      D.containmentPairs(docs, maxDocFreq = Some(10)),
      D.containmentPairs(docsX, maxDocFreq = Some(10)), false),
    ("s14_nprobe_recall",
      S.ivfNProbeRecall(emb), S.ivfNProbeRecall(embX), true),
    ("s16_pq_nprobe_recall",
      S.pqNProbeRecall(emb), S.pqNProbeRecall(embX), true),
    ("s23_mmr_diversify",
      S.mmrDiversifyTopK(emb), S.mmrDiversifyTopK(embX), true),
    ("dq06_fd_audit",
      DQ.fdAudit(Seq(
        ("events_user_type", Tables.events(spark, sf), "user_id",
          "event_type"),
        ("lineitem_part_supp", Tables.lineitem(spark, sf),
          "l_partkey", "l_suppkey"),
        ("orders_cust_priority", Tables.orders(spark, sf),
          "o_custkey", "o_orderpriority"))),
      DQ.fdAudit(Seq(
        ("events_user_type", ScaledTables.scaled(Tables.events(spark, sf),
          factor, idCols = Seq("user_id")), "user_id", "event_type"),
        ("lineitem_part_supp", ScaledTables.scaled(
          Tables.lineitem(spark, sf), factor,
          idCols = Seq("l_orderkey")), "l_partkey", "l_suppkey"),
        ("orders_cust_priority", ScaledTables.scaled(
          Tables.orders(spark, sf), factor, idCols = Seq("o_custkey")),
          "o_custkey", "o_orderpriority"))), false),
    ("g04_event_pagerank",
      graft.operators.Graph.eventTypePagerank(Tables.events(spark, sf)),
      graft.operators.Graph.eventTypePagerank(ScaledTables.scaled(
        Tables.events(spark, sf), factor, idCols = Seq("user_id"))),
      false),
    // c02: b01's one (unit, term) partial agg over ~tokens/stride
    // chunk units + broadcast stats (1-row cross intended) + one
    // doc-keyed max
    ("c02_chunk_maxp",
      graft.operators.Ranking.chunkMaxPRank(docs),
      graft.operators.Ranking.chunkMaxPRank(docsX), true),
    // p17: three batch scans (each p12's narrow shape) + one 48-row
    // merge agg — the per-batch scans are what a real incremental run
    // amortizes; the merge itself is O(shards)
    ("p17_incremental_manifest",
      graft.operators.Sampling.incrementalManifest(docs),
      graft.operators.Sampling.incrementalManifest(docsX), false),
    // m08: one cost-column scan + the p06 shard-parallel running sum
    ("m08_multimodal_packing",
      graft.operators.Multimodal.multimodalPacking(docs),
      graft.operators.Multimodal.multimodalPacking(docsX), false),
    // p16: one narrow corpus scan + model-scale source math (the
    // 1-row total broadcast cross is intended)
    ("p16_epoch_plan",
      graft.operators.Sampling.epochPlan(docs),
      graft.operators.Sampling.epochPlan(docsX), true),
    // t48: t43's piece broadcast + one source-keyed corpus agg
    ("t48_fertility_by_source", {
      val m = T.bpeTrain(docs, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.fertilityBySource(docs, m)
    }, {
      val mX = T.bpeTrain(docsX, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.fertilityBySource(docsX, mX)
    }, false),
    ("t47_detok_roundtrip", {
      val m = T.bpeTrain(docs, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.detokenizeRoundTrip(docs, m)
    }, {
      val mX = T.bpeTrain(docsX, nMerges = 8).collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      T.detokenizeRoundTrip(docsX, mX)
    }, false),
    // d19 is the d16 family's REMOVAL face: linear in occurrences by
    // design (one wh->owner row per fingerprint, no pair join)
    ("d19_span_removal",
      D.removeDuplicateSpans(docs), D.removeDuplicateSpans(docsX),
      false),
    // d20: star-contraction CC — per-round cost is the edge-table
    // shuffle; the ROUND COUNT is the log-vs-diameter claim, asserted
    // separately in TextDedupSpec. Like d07, the contraction loop runs
    // EAGERLY when this Seq is built (counts + anchors per round), so
    // the timed ratio below measures the anchored serve tail — the
    // loop's own scaling is the d07-shaped per-round shuffle. NOTE the
    // ×8 vector fixture is hostile to exact-cosine pair ops: the dim-0
    // shove makes every rep≥1 vector near-parallel to every other
    // (cosine dominated by the shoved component), so the near-dup
    // graph blows up ~×25,000 (9.8M pairs, max degree 1528 at sf0.1)
    // — both CC algorithms converging on THAT graph is the actual
    // stress content here
    ("d20_cc_star",
      D.starContraction(D.embeddingNearDups(emb)),
      D.starContraction(D.embeddingNearDups(embX)), false),
    // m05: banded blockhash near-dup — candidate volume is the risk.
    // The shared token rename is the WRONG perturbation here: blockhash
    // is invariant to uniform byte shifts BY DESIGN, so renamed
    // replicas stayed at Hamming ~0 from each other and pair volume
    // grew ~×64 — the r15 factor of 33.5 measured that manufactured
    // duplication (the d11 pre-rename precedent), not the operator
    // (bucket audit: top bucket held 3% of pairs — no hot key).
    // The perceptual analogue of the vector dim-0 shove is a
    // per-replica GRID SHIFT: appending rep·⌈n/32⌉ bytes of the doc's
    // own reversed prefix (per-doc content — a shared constant tail
    // would manufacture a hot key, the m06 lesson) changes the payload
    // length, which moves all 64 block boundaries, so replica
    // signatures decorrelate. Residual factor ~7.5 (from 33.5; the
    // window-count cap that rides the join's own exchange took the
    // groupBy+anti form's ~12 down further): after the striped-value
    // filter removed the top attractors, candidate volume is ×45
    // (8.8k → 354k pairs) carried by NEAR-striped attractor values
    // (e.g. '1110111101110111') whose cross-doc buckets grow ×8 in
    // membership (max 19 → 150) — text-stub signature density,
    // quadratic per attractor, bounded at any real scale by the 256
    // posting cap (which deliberately does NOT bind at this fixture:
    // binding it here would be tuning the cap to the ratchet instead
    // of to bounded per-bucket work).
    ("m05_perceptual_dedup",
      graft.operators.Multimodal.perceptualDedup(docs),
      graft.operators.Multimodal.perceptualDedup(docsXPerc), false),
    // m06: frame-sig Jaccard — the sig self-join is quadratic only
    // within one signature's posting list; the x8 rename keeps replica
    // frames distinct except degenerate (uniform) frames, so this
    // measures the hot-sig bucket exposure directly
    ("m06_video_frame_dedup",
      graft.operators.Multimodal.videoFrameDedup(docs),
      graft.operators.Multimodal.videoFrameDedup(docsX), false),
    // m07: m06's index shapes + per-video lead windows; unstrided
    ("m07_sequence_dedup",
      graft.operators.Multimodal.sequenceDedup(docs),
      graft.operators.Multimodal.sequenceDedup(docsX), false),
    ("t44_domain_boilerplate",
      T.domainBoilerplate(docs), T.domainBoilerplate(docsX), false),
    // t45: one token-keyed MIN shuffle + constant-size histogram
    // joins; the threshold joins are INEQUALITY joins against the
    // broadcast 5-row frame — the intended tiny-side BNLJ (16x5 work)
    ("t45_vocab_growth",
      T.vocabGrowth(docs), T.vocabGrowth(docsX), true),
    // b03: the feedback pass + term mining run eagerly at construction
    // (the nExpand-bounded collect); the timed ratio is the re-rank —
    // the corpus-scale stage. 1-row stats cross is the intended BNLJ
    ("b03_prf_expansion",
      graft.operators.Ranking.prfExpansion(docs),
      graft.operators.Ranking.prfExpansion(docsX), true),
    ("p12_shard_manifest",
      graft.operators.Sampling.shardManifest(docs),
      graft.operators.Sampling.shardManifest(docsX), false),
    ("p11_learned_filter",
      T.learnedQualityFilter(docs), T.learnedQualityFilter(docsX), true),
    // p13: p11's margin plan + the two-level rank + the p12 rollup;
    // the one-row keeper-count cross is the intended BNLJ
    ("p13_anneal_schedule",
      T.annealSchedule(docs), T.annealSchedule(docsX), true),
    // p14: audited per-doc plans re-aggregated by source; p08's
    // embedded one-row corpus crosses ride along (intended)
    ("p14_dataset_card",
      T.datasetCard(docs), T.datasetCard(docsX), true),
    ("s39_aniso_rotation_recall",
      S.anisotropicRotationRecall(emb), S.anisotropicRotationRecall(embX),
      true),
    // r17 additions. dq17: two distribution-median passes (distinct ≪
    // rows) + broadcast stat joins — linear by construction
    ("dq17_mad_outliers",
      DQ.madOutliers(Tables.events(spark, sf)),
      DQ.madOutliers(ScaledTables.scaled(Tables.events(spark, sf),
        factor, idCols = Seq("event_id"))), false),
    // b04: b01's one (doc, term) partial agg + the bounded per-term
    // TopKByScore; the 1-row corpus-stats cross is the intended BNLJ
    ("b04_retrieval_eval",
      graft.operators.Ranking.retrievalEval(docs),
      graft.operators.Ranking.retrievalEval(docsX), true),
    // b05 shares b04's judged chain; the tail is k+1-row broadcasts
    ("b05_retrieval_ndcg",
      graft.operators.Ranking.retrievalNdcg(docs),
      graft.operators.Ranking.retrievalNdcg(docsX), true),
    // p18: the production cost model is corpus×FIXED-eval (the eval
    // set is the bounded artifact being protected), so the scaled
    // variant widens the eval modulus to hold the eval count constant
    // — scaling both sides would measure the ×64 cross-product of a
    // workload no deployment runs. Broadcast eval × train scan is the
    // intended BNLJ (the s01 stance).
    ("p18_semantic_decontam",
      D.semanticDecontam(emb, col("vec_id") % 100 === 0),
      D.semanticDecontam(embX, col("vec_id") % (100L * factor) === 0),
      true),
    // p19: one (source, token) distinct partial agg, then K-row MW
    // arithmetic (anchored per round); 1-row crosses intended
    ("p19_domain_reweight",
      graft.operators.Sampling.domainReweight(docs),
      graft.operators.Sampling.domainReweight(docsX), true),
    // g10: rides s21's graph (cells scale with the corpus, the s21
    // lever); 3 bounded equi-join + partial-agg rounds on top
    ("g10_ppr_expansion",
      graft.operators.Graph.pprSeedExpansion(emb, nCells = 32),
      graft.operators.Graph.pprSeedExpansion(embX, nCells = 32 * factor),
      true),
    // s41: s01's broadcast×scan shape on the raw dot (+1-row max-norm
    // cross) — the bounded top-k keeps the shuffle at k rows per split
    ("s41_mips_topk",
      S.mipsTopK(emb), S.mipsTopK(embX), true),
    // k06: one k01 assign pass + K-row scatter agg; the K² pair math
    // runs on the LOCAL centroid frame (intended tiny crosses)
    ("k06_davies_bouldin",
      graft.operators.Clustering.daviesBouldin(emb),
      graft.operators.Clustering.daviesBouldin(embX), true),
    // p20: p19's trained weights + ONE more hash-threshold scan with a
    // source-keyed partial agg; p19's tiny crosses ride along
    ("p20_mixture_manifest",
      graft.operators.Sampling.mixtureManifest(docs),
      graft.operators.Sampling.mixtureManifest(docsX), true),
    // t49: pure scan-stage array expressions (O(tokens·W) per doc) —
    // no shuffle at all; the ratchet guards the window fan-out
    ("t49_mattr",
      T.mattr(docs), T.mattr(docsX), false),
    // c03: b01's partial-agg shape + a doc-keyed lag window over the
    // FILTERED query-term positions; 1-row stats cross intended
    ("c03_proximity_rank",
      graft.operators.Ranking.proximityRank(docs),
      graft.operators.Ranking.proximityRank(docsX), true),
    // s42: the augmented-column build (1-row cross) + s14's probe
    // pipeline + the s41 truth side — all intended broadcast shapes
    ("s42_mips_ivf_recall",
      S.mipsIvfRecall(emb), S.mipsIvfRecall(embX), true),
    // q40: WITH RECURSIVE path enumeration. event_type rides the
    // token-bijective rename, so each replica's transition graph is
    // isomorphic-but-disjoint: distinct edges AND the bounded-depth
    // recursion workload both grow ×factor (re-keying only user_id
    // would leave the edge graph constant and measure just the scan)
    // c04/b06/b07: the scaled corpus carries the per-replica token
    // rename, so the PROBE TERMS get the rep-0 suffix too — the
    // scaled run must exercise the matched scoring path, not an
    // empty IN-filter
    // c04: b01's (doc, term) IN-pruned partial agg + one doc-keyed
    // left join; the 1-row corpus-LM frame is the intended BNLJ
    ("c04_ql_dirichlet",
      graft.operators.Ranking.qlDirichletRank(docs),
      graft.operators.Ranking.qlDirichletRank(docsX,
        terms = graft.operators.Ranking.DefaultTerms.map(_ + "z0")),
      true),
    // b06: b04's judged chain + the QL side's x|terms| narrow fan-out
    // (a |terms|-row LM broadcast over (doc_id, dl) columns only);
    // both AP folds run on |terms|·k rows
    ("b06_ranker_compare",
      graft.operators.Ranking.rankerCompare(docs),
      graft.operators.Ranking.rankerCompare(docsX,
        terms = graft.operators.Ranking.DefaultTerms.map(_ + "z0")),
      true),
    // t51: the deployment posture — the model is the FIXED trained
    // artifact; the scaled corpus is scored under it (per-replica
    // token renames exercise the OOV single-char fallback tier at
    // scale). Segmentation is vocab-scale; the corpus pass rides the
    // broadcast per-word join; 1-row totals cross intended
    ("t51_unigram_score", {
      val m = T.unigramTrain(docs)
      T.unigramScore(docs, m)
    }, {
      val m = T.unigramTrain(docs)
      T.unigramScore(docsX, m)
    }, true),
    // l19/l20: one narrow write pass (cache miss, first timed pass
    // only) + a schema-explicit text-source scan; no joins, no crosses
    ("l19_jsonl_fidelity",
      graft.sources.FormatFidelity.jsonlRoundTrip(docs),
      graft.sources.FormatFidelity.jsonlRoundTrip(docsX), false),
    ("l20_csv_fidelity",
      graft.sources.FormatFidelity.csvRoundTrip(docs),
      graft.sources.FormatFidelity.csvRoundTrip(docsX), false),
    // l21: l20's pass shape plus the percent encode/decode map-side
    // expressions; the read is the default line-oriented (splittable)
    // CSV scan instead of multiLine
    ("l21_csv_splittable_fidelity",
      graft.sources.FormatFidelity.csvSplittableRoundTrip(docs),
      graft.sources.FormatFidelity.csvSplittableRoundTrip(docsX), false),
    // b07: b06's two corpus passes down to K rows; the 2^K flip
    // enumeration is data-size-independent (K = probe-query count)
    ("b07_sign_permutation",
      graft.operators.Ranking.rankerSignificance(docs),
      graft.operators.Ranking.rankerSignificance(docsX,
        terms = graft.operators.Ranking.DefaultTerms.map(_ + "z0")),
      true),
    // k07: one k01 assign pass + K-row scatter agg; BGSS is K²-local
    // pair math (intended tiny crosses, the k06 stance)
    ("k07_calinski_harabasz",
      graft.operators.Clustering.calinskiHarabasz(emb),
      graft.operators.Clustering.calinskiHarabasz(embX), true),
    // k08: the two-level pruned assignment at fixed K=64 (the serving
    // posture — model trained per corpus, corpus scales). NO nested
    // loop intended: the whole point is that the pruned path replaces
    // the brute broadcast-cross with coarse scoring + a gid-keyed
    // broadcast HASH join, so bnljIntended=false doubles as the
    // plan-shape assertion at both fixtures
    ("k08_pruned_assign",
      graft.operators.Clustering.prunedAssign(emb),
      graft.operators.Clustering.prunedAssign(embX), false),
    // g11: per half-step one edge-keyed join + a map-side-combined
    // weighted-sum agg over the token-renamed (isomorphic-disjoint)
    // transition graph; 1-row max crosses intended
    ("g11_hits",
      graft.operators.Graph.eventTypeHits(Tables.events(spark, sf)),
      graft.operators.Graph.eventTypeHits(
        ScaledTables.scaled(Tables.events(spark, sf), factor,
          idCols = Seq("event_id", "user_id"),
          textCols = Seq("event_type"))), true),
    // t52: one tokenize + (term) partial agg; everything after lives
    // in a <= 63-row array fold — no window funnel, no cross
    ("t52_zipf_profile",
      T.zipfProfile(docs), T.zipfProfile(docsX), false),
    ("q40_recursive_paths", {
      Tables.events(spark, sf).createOrReplaceTempView("ev_q40_base")
      spark.sql(SparkEntry.RecursivePathsSql("ev_q40_base"))
    }, {
      ScaledTables.scaled(Tables.events(spark, sf), factor,
        idCols = Seq("event_id", "user_id"),
        textCols = Seq("event_type"))
        .createOrReplaceTempView("ev_q40_scaled")
      spark.sql(SparkEntry.RecursivePathsSql("ev_q40_scaled"))
    }, false))

  /** Committed growth-factor history, keyed fixture-name -> op -> factor.
    * Flat hand-rolled read/write (the shape is two levels of string ->
    * number; jackson stays confined to the facade's parity property).
    * Anchored at the repo root (first ancestor holding build.sbt), not
    * the process CWD — an sbt launched from elsewhere would otherwise
    * find no history, silently bypass the ratchet, and self-record a
    * fresh baseline in the wrong place. Fails loudly if no root. */
  private val historyPath: java.nio.file.Path = {
    var d = java.nio.file.Paths.get("").toAbsolutePath
    while (d != null &&
        !java.nio.file.Files.exists(d.resolve("build.sbt"))) d = d.getParent
    require(d != null,
      "no build.sbt above CWD — cannot anchor STRESS_FACTORS.json ratchet")
    d.resolve("STRESS_FACTORS.json")
  }

  private def sfName: String = {
    val base = sf.split('/').filter(_.nonEmpty).lastOption.getOrElse(sf)
    if (factor == 8) base else s"$base@x$factor"
  }

  private def readHistory(): Map[String, Double] = {
    if (!java.nio.file.Files.exists(historyPath)) Map.empty
    else {
      val text = new String(java.nio.file.Files.readAllBytes(historyPath),
        java.nio.charset.StandardCharsets.UTF_8)
      // entries look like "sf0.001/d07_dedup_clusters": 3.21
      val entry = """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r
      entry.findAllMatchIn(text)
        .filter(_.group(1).startsWith(sfName + "/"))
        .map(m => m.group(1).stripPrefix(sfName + "/") -> m.group(2).toDouble)
        .toMap
    }
  }

  private def writeHistory(merged: Map[String, Double]): Unit = {
    val keep = if (!java.nio.file.Files.exists(historyPath)) Map.empty[String, Double]
    else {
      val text = new String(java.nio.file.Files.readAllBytes(historyPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val entry = """"([^"]+)"\s*:\s*(-?[0-9.]+)""".r
      entry.findAllMatchIn(text)
        .filterNot(_.group(1).startsWith(sfName + "/"))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val all = keep ++ merged.map { case (k, v) => s"$sfName/$k" -> v }
    val body = all.toSeq.sorted
      .map { case (k, v) =>
        "  \"" + k + "\": " + String.format(java.util.Locale.ROOT, "%.2f",
          Double.box(v))
      }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(historyPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Per-entry EXTRA ratio allowance for queries whose ×8 RATIO (not
    * time) is structurally unstable across run contexts: p11's
    * baseline shares its stored corpus gates with p10's, so in a FULL
    * suite run p10's timed passes pre-warm p11's baseline state (t1
    * reads ~1 s) while the scaled side stays cold — the scaled time is
    * STABLE (~5 s in-suite, solo, and quiet alike; quiet ratio
    * ×1.2–1.7; ×64 evidence 6.25, strongly sublinear) but the ratio
    * swings ~×3 with context. A real plan regression still trips the
    * widened bound: it moves tN, which is exactly the stable term
    * (adjudicated r19 — the in-suite ×5.02 spike vs quiet ×1.2 on
    * UNCHANGED code). */
  private val ratioNoiseAllowance: Map[String, Double] =
    Map("p11_learned_filter" -> 3.0)

  test(s"heavy set grows ≲linearly at ×$factor and keep sane plans ($sf)") {
    val recorded = readHistory()
    val rebaseline = sys.env.contains("GRAFT_STRESS_RECORD")
    // GRAFT_STRESS_ONLY=d20,m05 runs a comma-separated subset — for
    // re-recording individual entries (delete their STRESS_FACTORS
    // keys first) without paying the full-suite wall time. Entries are
    // timed sequentially either way, so filtering does not change what
    // a timed run sees.
    val only = sys.env.get("GRAFT_STRESS_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = heavySet.filter { case (name, _, _, _) =>
      only.forall(_.exists(name.startsWith))
    }
    val observed = scala.collection.mutable.Map[String, Double]()
    for ((name, baseline, scaledDf, bnljIntended) <- selected) {
      val plan = scaledDf.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name goes cartesian at ×$factor")
      if (!bnljIntended) assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name picks up a nested-loop join at ×$factor")

      val t1 = time(baseline)
      val tN = time(scaledDf)
      // generous ~linear bound: ×1.5·factor headroom on ×factor data
      // (×12 at the default ×8) plus a fixed allowance for job
      // overhead/GC jitter at fixture scale — a quadratic operator
      // (~×factor² = ×64 / ×4096) still fails by a wide margin
      assert(tN <= 1.5 * factor * t1 + 8.0,
        f"$name: ${t1}%.2fs -> ${tN}%.2fs at x$factor — superlinear")
      val growth = tN / t1
      observed(name) = growth
      info(f"$name: ${t1}%.2fs -> ${tN}%.2fs (x$growth%.1f)")
      // history ratchet: a factor that jumped past 1.5x its committed
      // value (+1.0 fixture-noise allowance) is a plan-shape regression
      // even if it still clears the generous linear bound above. The
      // recorded value is floored at 2.0 inside the bound: ops whose
      // quiet-rig factor is ~1 have sub-second timings whose RATIO
      // swings multiples under suite co-load (observed in-suite flake
      // after a tight rebaseline), while the regressions the ratchet
      // exists for — a broadcast flipping to BNLJ at scale — are x10-50
      // jumps that clear any floor this small
      recorded.get(name).filterNot(_ => rebaseline).foreach { rec =>
        val bound = 1.5 * math.max(rec, 2.0) + 1.0 +
          ratioNoiseAllowance.getOrElse(name, 0.0)
        assert(growth <= bound,
          f"$name ×$factor growth x$growth%.2f exceeds x$bound%.2f " +
            f"(1.5x its recorded x$rec%.2f, floored; STRESS_FACTORS" +
            ".json) — plan-shape regression; re-baseline deliberately " +
            "with GRAFT_STRESS_RECORD=1")
      }
    }
    // self-recording: first run at a fixture (or explicit re-baseline)
    // writes its factors; established entries are never silently moved
    val toWrite =
      if (rebaseline) observed.toMap
      else observed.toMap.filter { case (k, _) => !recorded.contains(k) }
    if (toWrite.nonEmpty) writeHistory(recorded ++ toWrite)
  }
}
