package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical relevance ranking (BM25) — the retrieval scorer used for
  * corpus curation (rank documents against a probe query, e.g. to mine
  * domain-specific training data) and as the baseline for RAG retrieval
  * quality work.
  *
  * Spark-first shape: term frequencies are one explode+filter (narrow,
  * the IN-list prunes the fan-out before the shuffle) and ONE (doc, term)
  * aggregation; document frequencies and corpus stats are tiny frames
  * broadcast back; the final top-k is TakeOrderedAndProject (per-partition
  * heaps, no global sort). At 100 TB the only full shuffle is the
  * (doc_id, term) partial-agg — everything else rides broadcasts.
  *
  * Oracle determinism: BM25's idf is kept in rational form
  * `(N - df + 0.5) / (df + 0.5)` — same monotone ordering as the usual
  * `ln` form for df < N, but `+ - * /` are IEEE-correctly-rounded in both
  * engines while `ln` is not. The per-document total is a FIXED-ORDER sum
  * of per-term conditional aggregates (each over at most one row), never
  * a float SUM whose accumulation order the engine picks — so scores are
  * bitwise identical to DuckDB's, not merely close. */
object Ranking {

  val DefaultTerms: Seq[String] = Seq("vector", "spark", "join", "scan")

  /** BM25 (k1 = 1.2, b = 0.75) of each document against `terms`; top `k`
    * docs by score. Output: doc_id, n_terms (matched), score. Documents
    * matching no term score 0 and are not ranked. */
  def bm25Rank(documents: DataFrame, terms: Seq[String] = DefaultTerms,
      k: Int = 20): DataFrame =
    bm25Scores(documents, terms)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** The unranked per-document BM25 frame b01/c03 share — every doc
    * matching ≥ 1 term with its fixed-order exact score. */
  private[operators] def bm25Scores(documents: DataFrame,
      terms: Seq[String]): DataFrame = {
    val docs = documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nd)
      .withColumn("score_t",
        ((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) * (tfd * lit(2.2)) /
          (tfd + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * dld / col("avgdl"))))
    val perTerm = terms.map(t =>
      sum(when(col("term") === t, col("score_t"))).as(s"s_$t"))
    val total = terms
      .map(t => coalesce(col(s"s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), perTerm: _*)
      .select(col("doc_id"), col("n_terms"), total.as("score"))
  }

  /** c02: CHUNK-level retrieval with maxP document scoring (Dai &
    * Callan 2019: score fixed-size passages, a document's relevance is
    * its BEST passage) — the standard fix for BM25's long-document
    * dilution, and the unit every RAG stack actually retrieves. Chunks
    * come from c01's overlapping windows ([[TextAnalysis
    * .chunkDocuments]]); each chunk is scored as an independent BM25
    * unit (N = chunk count, dl = chunk length, df over chunks — b01's
    * exact rational-idf, fixed-operand-order law verbatim, so chunk
    * scores are bitwise cross-engine); per document the max chunk
    * score wins, ties to the lowest chunk index. The whole-document
    * b01 rank rides along (0 = absent from the doc-level top-k) so one
    * table shows where passage scoring and document scoring disagree —
    * the re-ranking signal maxP exists to provide.
    *
    * Plan shape: c01's narrow chunk explode → b01's one (unit, term)
    * partial agg + broadcast df/stats → per-chunk fixed-order term sum
    * → one doc-keyed max + a tie-break min — every shuffle is a
    * partial agg, the final k rows via TakeOrderedAndProject. At
    * 100 TB this is b01's cost on ~tokens/stride units. */
  def chunkMaxPRank(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, window: Int = 64,
      stride: Int = 48, k: Int = 20): DataFrame = {
    val chunks = TextAnalysis.chunkDocuments(documents, window, stride)
      .select(col("doc_id"), col("chunk_idx"),
        col("n_chunk_tokens").cast("long").as("dl"),
        TextAnalysis.tokens(col("chunk_text")).as("toks"))
    val stats = chunks.agg(count(lit(1)).as("n_units"),
      sum(col("dl")).as("sum_dl"))
    val tf = chunks
      .select(col("doc_id"), col("chunk_idx"), col("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_units").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nd)
      .withColumn("score_t",
        ((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) * (tfd * lit(2.2)) /
          (tfd + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * dld / col("avgdl"))))
    val perTerm = terms.map(t =>
      sum(when(col("term") === t, col("score_t"))).as(s"s_$t"))
    val total = terms
      .map(t => coalesce(col(s"s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    val chunkScores = scored
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(perTerm.head, perTerm.tail: _*)
      .select(col("doc_id"), col("chunk_idx"), total.as("score"))
    val maxp = chunkScores.groupBy(col("doc_id"))
      .agg(max(col("score")).as("maxp_score"),
        count(lit(1)).as("n_chunks_matched"))
    val best = chunkScores.join(maxp, "doc_id")
      .filter(col("score") === col("maxp_score"))
      .groupBy(col("doc_id"), col("maxp_score"),
        col("n_chunks_matched"))
      .agg(min(col("chunk_idx")).as("best_chunk_idx"))
    // whole-doc b01 rank via the b02 sorted-array fold (never an
    // unpartitioned window)
    val docRank = bm25Rank(documents, terms, k)
      .agg(sort_array(collect_list(struct(
        (lit(0.0) - col("score")).as("negs"),
        col("doc_id").as("doc_id")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("p", "e")))
      .select(col("e.doc_id").as("doc_id"),
        (col("p") + 1).cast("long").as("doc_rank"))
    best.join(docRank, Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_chunk_idx").cast("long")
          .as("best_chunk_idx"),
        col("n_chunks_matched"), col("maxp_score"),
        coalesce(col("doc_rank"), lit(0L)).as("doc_rank"))
      .orderBy(col("maxp_score").desc, col("doc_id"))
      .limit(k)
  }

  /** b02: Reciprocal Rank Fusion (Cormack et al. 2009) of the lexical
    * and dense retrieval tiers — THE standard hybrid-retrieval merge
    * every RAG stack runs: rrf = Σ_lists 1/(60 + rank), docs missing
    * from a list contribute 0. Fuses b01's BM25 top-20 with the s01
    * exact-cosine top-20 for query vector 0 under the fixture's
    * doc_id ↔ vec_id identity (the m04 cross-modal wiring stance: the
    * fusion plan/semantics are what's proven; a real system swaps the
    * id mapping). Score determinism: each term is one division and
    * the two-term sum has a FIXED operand order.
    *
    * Plan shape: both tiers are their audited pipelines; the BM25
    * side's rank comes from the w19 sorted-array fold over its top-k
    * rows (a partial agg — never an unpartitioned window); the fusion
    * itself is a full-outer equi-join of two k-row frames + a
    * TakeOrderedAndProject. */
  def rrfFusion(documents: DataFrame, embeddings: DataFrame,
      k: Int = 10, kRrf: Int = 60, kLists: Int = 20): DataFrame = {
    val bmRanked = bm25Rank(documents, k = kLists)
      .agg(sort_array(collect_list(struct(
        (lit(0.0) - col("score")).as("negs"),
        col("doc_id").as("doc_id")))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("p", "e")))
      .select(col("e.doc_id").as("doc_id"),
        (col("p") + 1).cast("long").as("bm25_rank"))
    val dense = Similarity.bruteForceTopK(embeddings, nQueries = 1,
        k = kLists)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").as("dense_rank"))
    bmRanked.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("bm25_rank"), col("dense_rank"),
        (coalesce(lit(1.0) / (lit(kRrf) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")),
            lit(0.0))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }

  /** b03: PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio 1971 /
    * the RM-family relevance models) — the standard second retrieval
    * pass every serious lexical stack runs when queries are short:
    * take the top `kFeedback` BM25 docs as pseudo-relevant, mine the
    * `nExpand` terms most characteristic of that set (here: feedback
    * document frequency, the binary Rocchio weight — excluding the
    * original query terms and the four stopword lists, which would
    * otherwise dominate any feedback set), then re-rank the WHOLE
    * corpus against the expanded query with expansion terms
    * down-weighted by `beta` (Rocchio's β; 0.5 is exact in binary so
    * the weighting adds no float noise).
    *
    * The expansion-term list is collected to the driver — bounded by
    * `nExpand` (a model artifact, the k-medians discipline), never
    * corpus-scale — so the second pass is b01's audited static-term
    * plan with a wider IN-list.
    *
    * Score determinism (the b01 contract, dynamic-term form): per-term
    * scores are conditional aggregates summed in a FIXED left-to-right
    * chain over the term-ASC-sorted union vocabulary; the DuckDB twin
    * folds the term-ASC-ordered per-doc score list with a prepended
    * 0.0 — inserting the missing-term 0.0s Spark's COALESCE slots add
    * is bitwise free (x + 0.0 == x for the positive partials here), so
    * both engines build the identical float, not merely a close one.
    *
    * Plan shape: feedback pass = b01 (one (doc, term) partial agg +
    * broadcasts + TakeOrderedAndProject); term mining runs over the
    * kFeedback-doc slice only (broadcast semi-join, then a term-keyed
    * partial agg on a few hundred rows); the re-rank pass is b01's
    * shape again. At 100 TB the corpus is scanned twice — the price
    * every PRF system pays by definition. */
  def prfExpansion(documents: DataFrame, terms: Seq[String] = DefaultTerms,
      kFeedback: Int = 10, nExpand: Int = 5, beta: Double = 0.5,
      k: Int = 20): DataFrame = {
    val fb = bm25Rank(documents, terms, kFeedback).select(col("doc_id"))
    val stop = (TextAnalysis.StopEn ++ TextAnalysis.StopEs ++
      TextAnalysis.StopDe ++ TextAnalysis.StopFr).distinct
    val excluded = terms ++ stop
    val expansion = documents.join(broadcast(fb), "doc_id")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .filter(!col("term").isin(excluded: _*))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df_fb"))
      .orderBy(col("df_fb").desc, col("term").asc)
      .limit(nExpand)
      .collect().map(_.getString(0)).toSeq
    val weights = terms.map(_ -> 1.0).toMap ++
      expansion.map(_ -> beta).toMap
    val allTerms = (terms ++ expansion).distinct.sorted
    val docs = documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val weightCol = allTerms.foldLeft(lit(1.0)) { case (acc, t) =>
      when(col("term") === t, lit(weights(t))).otherwise(acc)
    }
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nd)
      .withColumn("w_t", weightCol *
        (((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) * (tfd * lit(2.2)) /
          (tfd + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * dld / col("avgdl")))))
    val perTerm = allTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("w_t"))).as(s"s_$i")
    }
    val total = allTerms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), perTerm: _*)
      .select(col("doc_id"), col("n_terms"), total.as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** c03: PROXIMITY-BOOSTED RETRIEVAL (Tao & Zhai 2007, "An
    * Exploration of Proximity Measures in Information Retrieval" —
    * the MinDist pairwise measure): BM25 treats a document as a bag,
    * so "spark join" scattered 500 tokens apart scores like the exact
    * phrase; the standard fix adds a span statistic — here MinDist,
    * the smallest position gap between occurrences of two DIFFERENT
    * query terms — as a rational boost 1/(1 + minDist) on top of the
    * b01 score. Docs matching fewer than two distinct terms get no
    * boost (bag score already tells the whole story).
    *
    * Adjacency suffices for MinDist (proved by descent: any closer
    * different-term pair with an occurrence between its endpoints
    * yields a closer pair at one end), so the scan is ONE lag window
    * over the FILTERED query-term positions — never all-pairs.
    *
    * Float discipline: the boost is one division of exact longs and
    * the final score ONE fixed-order two-term add onto b01's exact
    * chain — no libm (published MinDist wraps the distance in
    * ln(α + e^{−δ}); the rational boost keeps the same monotone
    * ordering cross-engine-exactly).
    *
    * Plan shape: b01's one (doc, term) partial agg + broadcasts; the
    * proximity side is a narrow posexplode filtered to the query terms
    * BEFORE the shuffle, then a doc-keyed lag window over ≤ per-doc
    * matched occurrences (query-term rows only — sparse by nature);
    * final k rows via TakeOrderedAndProject. */
  def proximityRank(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, k: Int = 20): DataFrame = {
    val base = bm25Scores(documents, terms)
    val pos = documents
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "term")))
      .where(col("term").isin(terms: _*))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val gaps = pos
      .select(col("doc_id"), col("pos"), col("term"),
        lag(col("term"), 1).over(w).as("pterm"),
        lag(col("pos"), 1).over(w).as("ppos"))
      .filter(col("pterm").isNotNull && col("term") =!= col("pterm"))
      .groupBy(col("doc_id"))
      .agg(min(col("pos") - col("ppos")).as("min_pair_dist"))
    base.join(gaps, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_terms"), col("score"),
        coalesce(col("min_pair_dist"), lit(-1L)).as("min_pair_dist"),
        (col("score") + when(col("min_pair_dist").isNotNull,
          lit(1.0) / (lit(1L) + col("min_pair_dist")).cast("double"))
          .otherwise(lit(0.0))).as("prox_score"))
      .orderBy(col("prox_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** b04/b05 shared frame: the per-term top-k BM25 ranking JUDGED
    * against the title-zone pseudo-qrels — returns (judged: one row per
    * (term, rank) with its 0/1 relevance, nRel: per-term relevant-doc
    * counts). One corpus pass; everything downstream operates on
    * |terms|·k rows. */
  private def judgedRanking(documents: DataFrame, terms: Seq[String],
      k: Int, titleTokens: Int): (DataFrame, DataFrame) = {
    val docs = documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val rel = docs
      .select(col("doc_id"), explode(array_distinct(
        slice(col("toks"), 1, titleTokens))).as("term"))
      .where(col("term").isin(terms: _*))
    val nRel = rel.groupBy(col("term")).agg(count(lit(1)).as("n_rel"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val dfd = col("df").cast("double")
    val tfd = col("tf").cast("double")
    val dld = col("dl").cast("double")
    val scored = tf
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nd)
      .withColumn("score_t",
        ((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) * (tfd * lit(2.2)) /
          (tfd + lit(1.2) *
            (lit(1.0) - lit(0.75) + lit(0.75) * dld / col("avgdl"))))
    val topAgg = graft.functions.TopKByScore.topK(k)(
      col("score_t"), col("doc_id"))
    val ranked = scored.groupBy(col("term")).agg(topAgg.as("top"))
      .select(col("term"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("term"), col("e.id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rank"))
    val judged = ranked
      .join(rel.withColumn("is_rel", lit(1L)), Seq("term", "doc_id"),
        "left")
      .select(col("term"), col("rank"),
        coalesce(col("is_rel"), lit(0L)).as("rel"))
    (judged, nRel)
  }

  /** b04: GRADED RETRIEVAL EVALUATION — per-query P@k / R@k / MRR /
    * AP@k of the single-term BM25 ranking against deterministic
    * relevance judgments (the TREC qrel loop every retrieval stack
    * closes before shipping an index change; Manning et al., IIR
    * ch. 8). Each probe term is its own query; a document is RELEVANT
    * to a term iff the term appears in its TITLE ZONE (first
    * `titleTokens` tokens) — a label derived independently of the
    * full-text score being judged, the standard pseudo-qrel when no
    * human judgments exist. AP@k uses the interpolation-free form
    * Σ_{i≤k} P(i)·rel(i) / min(n_rel, k).
    *
    * Float discipline: every metric is a ratio of exact longs — P(i) =
    * cum_hits(i)/i, MRR = 1/first_rel_rank, P@k, R@k — and AP's sum
    * folds those per-rank contributions in RANK order via the b03
    * sorted-list fold (0.0-seeded; non-relevant ranks contribute a
    * bitwise-free +0.0), so both engines build identical doubles.
    *
    * Plan shape: relevance labels are one narrow title-zone explode
    * (at a real eval the qrel set is a bounded artifact that
    * broadcast-joins instead); candidate scoring is b01's one
    * (doc, term) partial agg + broadcast df/stats; the per-term top-k
    * is the bounded mergeable [[graft.functions.TopKByScore]] partial
    * agg (map-side ≤ k rows per term per split — never a corpus-wide
    * per-term window funnel); everything after operates on
    * |terms|·k rows. At 100 TB the eval costs one corpus scan. */
  def retrievalEval(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, k: Int = 10,
      titleTokens: Int = 10): DataFrame = {
    val (judged, nRel) = judgedRanking(documents, terms, k, titleTokens)
    apAtK(judged, nRel, k)
  }

  /** The b04 metric tail over any (term, rank, rel) judged frame +
    * per-term n_rel counts — extracted so b06 can grade a SECOND
    * ranker against the same qrels with the identical fold (same
    * expressions, bit-for-bit the b04 outputs). */
  private def apAtK(judged: DataFrame, nRel: DataFrame,
      k: Int): DataFrame = {
    val cum = judged.withColumn("cum_hits",
      sum(col("rel")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(col("rank"))))
      .withColumn("contrib",
        when(col("rel") === 1L,
          col("cum_hits").cast("double") / col("rank").cast("double"))
          .otherwise(lit(0.0)))
    val perTerm = cum.groupBy(col("term"))
      .agg(sum(col("rel")).as("n_hits"),
        coalesce(lit(1.0) /
          min(when(col("rel") === 1L, col("rank"))).cast("double"),
          lit(0.0)).as("mrr"),
        aggregate(sort_array(collect_list(struct(col("rank"),
          col("contrib")))), lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("ap_num"))
    perTerm.join(broadcast(nRel), Seq("term"), "left")
      .select(col("term"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("n_hits"),
        (col("n_hits").cast("double") / lit(k.toDouble)).as("p_at_k"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("n_hits").cast("double") /
            col("n_rel").cast("double")).as("r_at_k"),
        col("mrr"),
        when(coalesce(col("n_rel"), lit(0L)) === 0L, lit(0.0))
          .otherwise(col("ap_num") /
            least(col("n_rel"), lit(k.toLong)).cast("double"))
          .as("ap_at_k"))
      .orderBy(col("term"))
  }

  /** Rank-indexed nDCG discount table 1/log2(1+r), r = 1..k — computed
    * ONCE on the driver and embedded as the SAME double literals in
    * both the Spark plan and the oracle SQL ([[graft.SparkEntry]]
    * renders these exact values into the VALUES list), so log2 — libm,
    * last-ulp-risky — has a single source of truth and neither engine
    * evaluates it. */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(r => 1.0 / (math.log1p(r.toDouble) / math.log(2.0)))

  /** Ideal-DCG prefix table: idcg(m) = Σ_{r≤m} discount(r) for
    * m = 0..k, folded in rank order on the driver (binary gains: the
    * ideal ranking is all n_rel relevant docs first, so
    * IDCG@k = idcg(min(n_rel, k))). Same shared-literal contract as
    * [[ndcgDiscounts]]. */
  def ndcgIdeals(k: Int): Seq[Double] =
    ndcgDiscounts(k).scanLeft(0.0)(_ + _)

  /** b05: nDCG@k — the graded-relevance headline metric a real eval
    * harness reports first (Järvelin & Kekäläinen 2002), over the SAME
    * judged ranking as b04 (binary gains are valid nDCG: gain(rel) =
    * rel). DCG@k folds rel(r)·discount(r) in RANK order (the b03/b04
    * sorted-list fold — non-relevant ranks add a bitwise-free +0.0);
    * IDCG@k is a TABLE LOOKUP idcg(min(n_rel, k)) against the
    * driver-precomputed prefix sums, so the division is the only
    * arithmetic either engine performs on the discounts.
    *
    * Plan shape: b04's one corpus pass down to the |terms|·k judged
    * frame; the discount and ideal tables are k+1-row broadcast joins;
    * output is |terms| rows. */
  def retrievalNdcg(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, k: Int = 10,
      titleTokens: Int = 10): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val (judged, nRel) = judgedRanking(documents, terms, k, titleTokens)
    val disc = ndcgDiscounts(k).zipWithIndex
      .map { case (d, i) => ((i + 1).toLong, d) }.toDF("rank", "disc")
    val ideal = ndcgIdeals(k).zipWithIndex
      .map { case (s, m) => (m.toLong, s) }.toDF("m", "idcg")
    val contrib = judged.join(broadcast(disc), Seq("rank"))
      .withColumn("contrib",
        when(col("rel") === 1L, col("disc")).otherwise(lit(0.0)))
    val perTerm = contrib.groupBy(col("term"))
      .agg(sum(col("rel")).as("n_hits"),
        aggregate(sort_array(collect_list(struct(col("rank"),
          col("contrib")))), lit(0.0),
          (acc, x) => acc + x.getField("contrib")).as("dcg"))
    perTerm.join(broadcast(nRel), Seq("term"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .join(broadcast(ideal),
        least(col("n_rel"), lit(k.toLong)) === col("m"))
      .select(col("term"), col("n_rel"), col("n_hits"), col("dcg"),
        when(col("n_rel") === 0L, lit(0.0))
          .otherwise(col("dcg") / col("idcg")).as("ndcg_at_k"))
      .orderBy(col("term"))
  }

  /** Default Dirichlet pseudo-count: the μ ≈ 2000 plateau of Zhai &
    * Lafferty 2004's sweep (Table 2 — retrieval quality is flat in
    * 500..10000, so the canonical 2000 is not a tuned constant). */
  val DefaultMu: Long = 2000L

  /** The per-(doc, term) Dirichlet-smoothed likelihood factor, shared
    * by c04 and b06:
    *
    *   p(t|d) = (tf + μ·cf/|C|) / (dl + μ)
    *          = (tf·|C| + μ·cf) / (|C|·(dl + μ))
    *
    * kept in the right-hand all-integer form: both products and the
    * sum are EXACT long arithmetic, the division is the single float
    * op — IEEE-correctly-rounded identically in both engines (the b01
    * rational-idf discipline). Overflow headroom: numerator ≤
    * dl·|C| + μ·|C| and denominator |C|·(dl+μ) stay in a long while
    * |C|·(dl_max + μ) < 2⁶³ — e.g. 10¹⁴ corpus tokens against
    * 10⁴-token docs; beyond that shard the corpus stat or move the
    * two products to DECIMAL internally (the published face stays
    * DOUBLE). */
  private def qlFactor(tf: Column, cf: Column, dl: Column,
      cTotal: Column, mu: Long): Column =
    (tf * cTotal + lit(mu) * cf).cast("double") /
      (cTotal * (dl + lit(mu))).cast("double")

  /** c04: QUERY-LIKELIHOOD retrieval with Dirichlet smoothing (Ponte &
    * Croft 1998; Zhai & Lafferty 2004) — the probabilistic-LM scoring
    * paradigm, the OTHER lexical family besides b01/c03's tf-idf line:
    * rank documents by the probability their language model generates
    * the query, smoothing each term's document probability toward the
    * corpus model with pseudo-count μ. Scores EVERY document (a doc
    * matching no term still carries the smoothed corpus mass, shrunk
    * by its length prior — short docs legitimately outrank long
    * tangential matches, the behavioral signature that distinguishes
    * QL from BM25).
    *
    * Float discipline: published QL sums log-probabilities; log is
    * libm (last-ulp risk across engines), so the score is the
    * LIKELIHOOD itself — the product of the exact per-term rational
    * factors ([[qlFactor]]) folded in FIXED query-term order. Same
    * monotone ordering as the log form; each factor is one
    * correctly-rounded division and each multiply is one
    * correctly-rounded op on operands both engines built identically,
    * so scores are bitwise cross-engine. Underflow: factors at corpus
    * scale sit ~10⁻⁴..10⁻⁸; a |q|-term product floors around 10⁻⁸·|q|
    * — subnormal territory needs |q| ≳ 38, not a retrieval workload
    * (and subnormals round identically anyway).
    *
    * Plan shape: one corpus scan → (doc_id, dl) plus the same narrow
    * IN-pruned (doc, term) partial agg b01 runs; the corpus LM (total
    * token count + per-term collection frequencies) is ONE broadcast
    * 1-row frame (intended BNLJ, the dq10 pattern); matched tfs come
    * back via one doc-keyed left join; final k rows via
    * TakeOrderedAndProject. At 100 TB: two corpus passes (stat + score),
    * no corpus-sized shuffle beyond the (doc, term) partial agg. */
  def qlDirichletRank(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, mu: Long = DefaultMu,
      k: Int = 20): DataFrame = {
    val docs = documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tf = documents
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // the corpus language model as ONE row: total tokens + fixed-order
    // per-term collection frequencies (exact longs)
    val cfCols = terms.map(t =>
      coalesce(sum(when(col("term") === t, col("tf"))), lit(0L))
        .as(s"cf_$t"))
    val lm = tf.groupBy().agg(cfCols.head, cfCols.tail: _*)
      .crossJoin(docs.agg(sum(col("dl")).as("c_total")))
    val tfCols = terms.map(t =>
      coalesce(sum(when(col("term") === t, col("tf"))), lit(0L))
        .as(s"tf_$t"))
    val tfP = tf.groupBy(col("doc_id"))
      .agg(tfCols.head, tfCols.tail: _*)
    val base = docs.join(tfP, Seq("doc_id"), "left")
      .crossJoin(broadcast(lm))
    val factors = terms.map(t => qlFactor(
      coalesce(col(s"tf_$t"), lit(0L)), col(s"cf_$t"), col("dl"),
      col("c_total"), mu))
    val nTerms = terms
      .map(t => when(coalesce(col(s"tf_$t"), lit(0L)) > 0L, lit(1L))
        .otherwise(lit(0L)))
      .reduceLeft(_ + _)
    base.select(col("doc_id"), nTerms.as("n_terms"), col("dl"),
        factors.reduceLeft(_ * _).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The QL counterpart of [[judgedRanking]]: per-term top-k by the
    * single-term Dirichlet likelihood ([[qlFactor]] — one factor IS
    * the single-term QL score), judged against the SAME title-zone
    * pseudo-qrels. Every document competes for every term (the QL
    * semantics above), so scoring fans the corpus out ×|terms| via a
    * broadcast of the |terms|-row corpus-LM frame — narrow columns
    * (doc_id, dl) only, an intended bounded-small-side nested loop.
    * The per-term top-k is the bounded mergeable TopKByScore partial
    * agg, ≤ k rows per term per split across the shuffle. */
  private def qlJudgedRanking(documents: DataFrame, terms: Seq[String],
      k: Int, titleTokens: Int, mu: Long): (DataFrame, DataFrame) = {
    val docs = documents
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long")
        .as("dl"))
    val rel = docs
      .select(col("doc_id"), explode(array_distinct(
        slice(col("toks"), 1, titleTokens))).as("term"))
      .where(col("term").isin(terms: _*))
    val nRel = rel.groupBy(col("term")).agg(count(lit(1)).as("n_rel"))
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lm = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
      .crossJoin(docs.agg(sum(col("dl")).as("c_total")))
    val scored = docs.select(col("doc_id"), col("dl"))
      .crossJoin(broadcast(lm))
      .join(tf, Seq("doc_id", "term"), "left")
      .withColumn("qls", qlFactor(coalesce(col("tf"), lit(0L)),
        col("cf"), col("dl"), col("c_total"), mu))
    val topAgg = graft.functions.TopKByScore.topK(k)(
      col("qls"), col("doc_id"))
    val ranked = scored.groupBy(col("term")).agg(topAgg.as("top"))
      .select(col("term"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("term"), col("e.id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rank"))
    val judged = ranked
      .join(rel.withColumn("is_rel", lit(1L)), Seq("term", "doc_id"),
        "left")
      .select(col("term"), col("rank"),
        coalesce(col("is_rel"), lit(0L)).as("rel"))
    (judged, nRel)
  }

  /** b06: PAIRED RANKER COMPARISON — BM25 (b01's chain) vs
    * query-likelihood Dirichlet (c04's scorer) graded per query on the
    * SAME title-zone pseudo-qrels, the A/B evaluation a retrieval
    * stack runs before switching scorers (Smucker et al. 2007 frame
    * the significance side; with a handful of probe queries the
    * per-query deltas + the sign tally ARE the evidence table).
    * Per term: n_rel, both AP@k values (each produced by the identical
    * b04 metric fold — [[apAtK]]), their delta, and the sign of the
    * delta (+1 QL wins, −1 BM25 wins, 0 tie). The delta is ONE
    * subtraction of two bitwise-reproducible doubles; the sign is
    * exact.
    *
    * Plan shape: the b04 chain (one corpus pass) + the QL judged chain
    * (one corpus pass, ×|terms| narrow fan-out) joined on |terms|
    * rows. */
  def rankerCompare(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, k: Int = 10,
      titleTokens: Int = 10, mu: Long = DefaultMu): DataFrame = {
    val bm = retrievalEval(documents, terms, k, titleTokens)
      .select(col("term"), col("n_rel"), col("ap_at_k").as("ap_bm25"))
    val (qj, qnRel) = qlJudgedRanking(documents, terms, k, titleTokens,
      mu)
    val ql = apAtK(qj, qnRel, k)
      .select(col("term"), col("ap_at_k").as("ap_ql"))
    bm.join(ql, Seq("term"))
      .withColumn("delta", col("ap_ql") - col("ap_bm25"))
      .select(col("term"), col("n_rel"), col("ap_bm25"), col("ap_ql"),
        col("delta"),
        when(col("delta") > 0.0, lit(1L))
          .when(col("delta") < 0.0, lit(-1L))
          .otherwise(lit(0L)).as("sign"))
      .orderBy(col("term"))
  }

  /** b07: EXACT SIGN-FLIP PERMUTATION TEST over b06's per-query AP
    * deltas — the significance answer to "ranker A beat ranker B on
    * K queries: is that evidence or coin flips?" (Smucker et al. 2007
    * rank the randomization test as the reference procedure for
    * paired IR evaluation). Under H₀ the rankers are exchangeable per
    * query, so each delta's sign is arbitrary: enumerate ALL 2^K sign
    * assignments (no sampling, no RNG — with the probe-query K the
    * full null distribution is smaller than one shuffle block;
    * published implementations sample 10⁴ of the 2^K only because
    * their K is hundreds) and report the two-sided
    * p = #{assignments: |mean| ≥ |observed mean|} / 2^K. The identity
    * assignment always counts, so p ≥ 2^−K — the test is honest about
    * what K queries can ever establish.
    *
    * Float discipline: deltas fold in TERM order (sorted-array
    * aggregate); each flip is an IEEE negation (exact); every flipped
    * mean reuses the same ÷K tree; the p-value is one division of
    * exact longs. Deterministic end to end.
    *
    * Plan shape: b06's two corpus passes down to K rows → ONE
    * global sorted-array partial-merge aggregate → a 2^K-row explode
    * re-aggregated with map-side combine. K is the probe-query count
    * (bounded, ≤ ~20 before 2^K itself needs sampling — document the
    * cap, don't silently sample). */
  def rankerSignificance(documents: DataFrame,
      terms: Seq[String] = DefaultTerms, k: Int = 10,
      titleTokens: Int = 10, mu: Long = DefaultMu): DataFrame = {
    require(terms.size <= 20,
      s"exact sign-flip enumeration is 2^K; K=${terms.size} > 20 " +
        "needs a sampled test instead")
    val deltas = rankerCompare(documents, terms, k, titleTokens, mu)
      .select(col("term"), col("delta"))
    deltas.groupBy()
      .agg(sort_array(collect_list(struct(col("term"), col("delta"))))
        .as("xs"))
      .select(col("xs"), size(col("xs")).cast("long").as("nq"),
        expr("""aggregate(xs, CAST(0.0 AS DOUBLE),
          |  (a, x) -> a + x.delta)""".stripMargin).as("sum_obs"))
      // zero judged queries (no term matched any doc) → no test to
      // run: empty output, like b06's, not a 0/0 row
      .filter(col("nq") > 0L)
      .withColumn("mean_obs", col("sum_obs") / col("nq").cast("double"))
      .select(col("xs"), col("nq"), col("mean_obs"),
        explode(expr(
          "sequence(CAST(0 AS BIGINT), " +
            "shiftleft(CAST(1 AS BIGINT), CAST(nq AS INT)) - 1)"))
          .as("m"))
      .withColumn("sum_m", expr(
        """aggregate(xs,
          |  named_struct('i', 0, 's', CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> named_struct('i', acc.i + 1,
          |    's', acc.s + IF(shiftright(m, acc.i) % 2 = 1,
          |      -x.delta, x.delta)),
          |  acc -> acc.s)""".stripMargin))
      .withColumn("extreme",
        abs(col("sum_m") / col("nq").cast("double")) >=
          abs(col("mean_obs")))
      .groupBy(col("nq"), col("mean_obs"))
      .agg(count(lit(1)).as("n_flips"),
        sum(when(col("extreme"), lit(1L)).otherwise(lit(0L)))
          .as("n_extreme"))
      .select(col("nq").as("n_queries"),
        col("mean_obs").as("mean_delta"),
        col("n_flips"), col("n_extreme"),
        (col("n_extreme").cast("double") / col("n_flips").cast("double"))
          .as("p_value"),
        ((col("n_extreme").cast("double") /
          col("n_flips").cast("double")) <= 0.05).as("significant"))
  }
}
