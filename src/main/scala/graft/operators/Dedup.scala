package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Anchor.AnchorOps

/** Deduplication layer for LLM training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup — the
  * standard large-corpus dedup toolbox.
  *
  * Scale notes (100 TB):
  *  - exact dedup is one hash-shuffle on the content digest (map-side
  *    partial agg collapses copies early);
  *  - the inverted-index Jaccard join shuffles on shingle. Posting lists
  *    are CAPPED by default (`maxDocFreq = Some(DefaultMaxDocFreq)`):
  *    boilerplate shingles shared by more docs than the cap would create
  *    quadratic hot postings at web scale. Pass `None` explicitly for
  *    exact candidate generation (any pair with J > 0 shares a shingle);
  *  - MinHash/LSH replaces the quadratic verify set with banded signature
  *    buckets: only pairs agreeing on a full band collide, so the shuffle
  *    volume is |docs| × bands regardless of corpus similarity structure;
  *  - all hashing is md5-based and salt-deterministic: no RNG, so results
  *    are reproducible across engines and runs (oracle-checked vs DuckDB).
  */
object Dedup {

  /** Corpus doubled with offset ids — makes exact-dedup checks non-vacuous
    * on fixtures that contain no byte-identical duplicates. */
  def doubledCorpus(documents: DataFrame, offset: Long = 1000000L): DataFrame =
    documents.select(col("doc_id"), col("text"))
      .unionByName(documents.select((col("doc_id") + offset).as("doc_id"),
        col("text")))

  /** THE content digest: md5 of whitespace-normalized text. Single source
    * of truth — batch dedup, incremental dedup, and streaming dedup must
    * all hash identically or corpus duplicates slip through silently. */
  def contentDigest(text: Column): Column =
    md5(regexp_replace(trim(text), "\\s+", " "))

  /** Exact dedup by content digest: md5 of whitespace-normalized text,
    * keep the lowest doc_id per group. One shuffle on the digest. */
  def exactDedup(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), contentDigest(col("text")).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"))
      .select(col("kept_doc_id"), col("content_md5"), col("n_copies"))
      .orderBy(col("kept_doc_id"))

  /** d08: exact dedup over CANONICALIZED text — NFC normalization then
    * Unicode tokenization, rejoined with single spaces — the dedup
    * front-end a multilingual corpus needs: the same sentence arrives
    * NFC from one crawl and NFD from another (macOS filenames, CMS
    * pipelines), with punctuation glued or spaced, and [[contentDigest]]
    * (bytes after whitespace collapse) treats every variant as distinct.
    *
    * The fixture corpus is tripled with deterministic variants of each
    * doc — NFC + glued period / NFD + spaced period / double-spaced —
    * so each content group carries 3 distinct RAW digests
    * (`n_raw_variants`, what d01's byte hashing would keep) but ONE
    * canonical digest. Same single-shuffle shape as [[exactDedup]]; the
    * canonicalization is two codegen expressions in the scan stage. */
  def normalizedDedup(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    val corpus = base
      .select(col("doc_id"),
        concat(col("text"), lit(" café.")).as("raw"))
      .unionByName(base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" café .")).as("raw")))
      .unionByName(base.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit("  café.")).as("raw")))
    val canonical = array_join(graft.functions.TokenFns.unicodeTokens(
      graft.functions.NfcFns.nfc(col("raw"))), " ")
    corpus
      .select(col("doc_id"), md5(canonical).as("content_md5"),
        md5(col("raw")).as("raw_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("kept_doc_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("raw_md5")).as("n_raw_variants"))
      .select(col("kept_doc_id"), col("content_md5"), col("n_copies"),
        col("n_raw_variants"))
      .orderBy(col("kept_doc_id"))
  }

  /** d09: typo-tolerant fuzzy matching — blocked edit-distance pairs
    * over short key strings (titles here: each doc's leading 30 chars),
    * the entity-resolution primitive exact and shingle dedup both miss
    * (one swapped character changes every digest and most shingles).
    *
    * Scale shape: all-pairs Levenshtein is O(n²) and unrunnable, and a
    * LOW-selectivity block key (first character / length band) merely
    * hides the quadratic inside giant blocks — measured: first-char
    * blocks on the fixture corpus held 20% of all titles, making d09
    * the slowest query in the round-8 bench until the key was fixed.
    * This uses TWO selective passes — prefix-8 and suffix-8 block keys
    * (max block ≈ 3% of the corpus here) — unioned and deduped: an
    * edit anywhere outside ONE of the zones is caught by the other
    * pass, the same OR-amplification idea as multi-table LSH (s07).
    * Edits touching both zones escape (documented recall bound; more
    * passes = more recall, same as more tables). Refine is a codegen'd
    * `levenshtein` on the block-join output.
    *
    * The fixture corpus is doubled with deterministic third-character
    * typos (suffix-block-preserving by construction), so every
    * original↔typo pair is found at distance ≤ 1 alongside any natural
    * near-pairs. */
  def fuzzyPairs(documents: DataFrame, maxDist: Int = 2): DataFrame = {
    val base = documents.select(col("doc_id"),
      substring(col("text"), 1, 30).as("title"))
    val typod = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(substring(col("title"), 1, 2), lit("x"),
        substring(col("title"), 4, 27)).as("title"))
    val corpus = base.unionByName(typod)
      .select(col("doc_id"), col("title"), explode(array(
        concat(lit("p:"), substring(col("title"), 1, 8),
          lit(":"), length(col("title")).cast("string")),
        concat(lit("s:"), substring(col("title"), 23, 8),
          lit(":"), length(col("title")).cast("string")))).as("block"))
    val left = corpus.select(col("block"), col("doc_id").as("doc_a"),
      col("title").as("title_a"))
    val right = corpus.select(col("block"), col("doc_id").as("doc_b"),
      col("title").as("title_b"))
    left.join(right, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("dist",
        levenshtein(col("title_a"), col("title_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Round-robin spread of a narrow input BEFORE a generator/hash blowup.
    * Fixture parquet (and many real corpora) arrive as a handful of row
    * groups, so the whole shingle/hash expansion would otherwise run on
    * 1-2 cores until the first shuffle. The exchange moves the COMPACT
    * pre-explosion rows (1×), buying full parallelism for the 10-100×
    * expansion — worth it at every scale. */
  private[operators] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Default posting-list cap: a shingle shared by more docs than this is
    * boilerplate (licence headers, navigation chrome), and every doc pair
    * it links is almost certainly linked by rarer shingles too. The cap
    * bounds the posting self-join at cap²/2 pairs per shingle; without it
    * one hot shingle across 1M docs creates a 10¹²-pair posting at web
    * scale. Callers wanting EXACT candidate generation (no shingle ever
    * dropped) pass `maxDocFreq = None` explicitly. */
  val DefaultMaxDocFreq: Int = 1000

  /** (doc_id, shingle) posting list over DISTINCT word n-gram shingles,
    * dropping shingles shared by more than `maxDocFreq` docs (boilerplate
    * guard — capped by default; pass None for exact candidate
    * generation). */
  def shinglePostings(documents: DataFrame, n: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val sh = spread(documents).select(col("doc_id"),
      explode(array_distinct(
        graft.functions.TextFns.wordShingles(col("text"), n)))
        .as("shingle"))
    maxDocFreq match {
      case None => sh
      case Some(cap) =>
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("shingle"))
        // using-column joins emit the join key first; restore the
        // (doc_id, shingle) order both branches promise
        sh.join(hot, Seq("shingle"), "left_anti")
          .select(col("doc_id"), col("shingle"))
    }
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted-index self-join:
    * shuffle on shingle → per-pair intersection counts → sizes join →
    * J = |A∩B| / (|A|+|B|−|A∩B|), thresholded. Candidate generation is
    * exact (no pair above threshold is missed) only with
    * `maxDocFreq = None`; the capped default drops hot boilerplate
    * shingles, which both prunes candidates AND computes J over the
    * capped posting sets (per-doc sizes n_sh count surviving shingles),
    * i.e. capped mode approximates candidates and scores together. */
  def jaccardPairs(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val post = shinglePostings(documents, n, maxDocFreq)
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = post.toDF("doc_a", "shingle")
      .join(post.toDF("doc_b", "shingle_b"),
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d12: shingle CONTAINMENT — the asymmetric near-dup relation Jaccard
    * structurally misses: a short doc quoted inside a long one scores
    * near-zero Jaccard (the union is dominated by the long doc's
    * shingles) but containment |A∩B| / |A| ≈ 1. This is the standard
    * excerpt/quote detector a training-data pipeline needs on top of
    * symmetric dedup: Gutenberg-style anthologies, chunked re-posts, and
    * quote farms all contain other corpus docs without resembling them.
    *
    * The fixture corpus is doubled with deterministic excerpts (each
    * doc's leading 200 chars under id+1000000): a contiguous prefix's
    * word 3-grams are a subset of the original's, so every
    * excerpt→original pair scores containment 1.0 (boundary-token
    * effects may shave the final shingle — threshold 0.9 keeps the
    * contract) alongside any natural high-containment pairs.
    *
    * Scale shape: identical to [[jaccardPairs]] — one inverted-index
    * shuffle on shingle, posting-capped by default, per-pair counts then
    * a sizes join; the only change is the denominator (|A| instead of
    * |A∪B|), which also makes the pair DIRECTED (both orientations are
    * scored; only high-containment ones survive the filter). */
  def containmentPairs(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.9,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 1000000L).as("doc_id"),
        substring(col("text"), 1, 200).as("text")))
    val post = shinglePostings(corpus, n, maxDocFreq)
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // |A∩B| is symmetric, only the denominator is directed: compute each
    // unordered pair ONCE (a < b — halves the posting self-join output
    // and the pair-agg shuffle vs a naive a ≠ b join) and emit both
    // orientations by swapping afterward, which is a cheap projection
    val interHalf = post.toDF("doc_a", "shingle")
      .join(post.toDF("doc_b", "shingle_b"),
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val inter = interHalf.unionByName(interHalf.select(
      col("doc_b").as("doc_a"), col("doc_a").as("doc_b"), col("inter")))
    inter
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("n_a").cast("double"))
          .as("containment"))
      .filter(col("containment") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Distributed MinHash: k salted md5-min hashes over word-3-gram shingles,
    * computed RELATIONALLY — explode postings × salt dimension, shuffle-min
    * on (doc, salt), reassemble the signature ordered by salt index.
    *
    * This shape matters twice over: (a) nested higher-order lambdas are
    * interpreted per element in Spark (no codegen) and re-evaluate their
    * captured subtrees, which measured ~60 ms/row on 100-token docs — the
    * explode/agg form is >50× faster; (b) it distributes by ROW COUNT, not
    * document length, so one pathological 1 GB document can't stall a task.
    * Salting is deterministic (salt j ‖ ':' ‖ shingle) — no RNG, bitwise
    * reproducible across engines and runs.
    *
    * Returns (doc_id, sig: array<string> of length k, bands: array<string>
    * of k/rowsPerBand band digests). */
  def withMinhash(documents: DataFrame, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val nBands = k / rowsPerBand
    // No posting cap here: minhash is linear in postings (no self-join), a
    // hot shingle costs nothing extra, and dropping one would corrupt the
    // signatures of every doc that contains it.
    val hashed = shinglePostings(documents, 3, maxDocFreq = None)
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .select(col("doc_id"), col("j"),
        md5(concat(col("j").cast("string"), lit(":"), col("shingle")))
          .as("h"))
    hashed
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("h")).as("minh"))
      .groupBy(col("doc_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("j"), col("minh")))),
        s => s.getField("minh")).as("sig"))
      .withColumn("bands", expr(
        s"""transform(sequence(0, ${nBands - 1}), b ->
           |  md5(array_join(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
           |    '|')))""".stripMargin))
  }

  /** d11: MinHash estimator calibration — for each exact near-dup pair
    * (d02's ground truth), the fraction of agreeing signature
    * components IS the MinHash estimate of Jaccard; reporting both
    * side by side is the eval loop that justifies k (more components
    * = tighter estimate = more shuffle volume), exactly as s05
    * justifies the LSH bit budget. Deterministic: both the exact and
    * estimated sides are salted-md5 pipelines, no RNG.
    *
    * Scale: the component comparison is O(k) per SURVIVING pair (the
    * near-dup set, not the corpus); signatures join by doc key. The
    * measured ×8 factor (8.2–8.7, re-confirmed r18) sits just over
    * linear for the same reason as d17: the pair side grows ×8 while
    * the fixed shuffle constant (signature build + d02's inverted-index
    * exchange) amortizes less per row at the larger size — a shuffle-
    * constant artifact of exact similarity joins, not a candidate-set
    * blowup (the per-replica token renaming keeps pair density linear
    * by construction). */
  def minhashJaccardEval(documents: DataFrame, k: Int = 12): DataFrame = {
    val exact = jaccardPairs(documents, maxDocFreq = None)
    val sig = withMinhash(documents, k).select(col("doc_id"), col("sig"))
    val agree = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), _ + _)
    exact
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")),
        "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        "doc_b")
      .withColumn("n_agree", agree)
      .select(col("doc_a"), col("doc_b"), col("jaccard"), col("n_agree"),
        (col("n_agree").cast("double") / lit(k.toDouble))
          .as("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Per-document MinHash signature + band digests, presentation form. */
  def minhashSignatures(documents: DataFrame, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame =
    withMinhash(documents, k, rowsPerBand)
      .select(col("doc_id"),
        array_join(col("sig"), "|").as("signature"),
        array_join(col("bands"), "|").as("band_digests"))
      .orderBy(col("doc_id"))

  /** LSH candidate pairs: explode band digests, self-join on
    * (band index, digest) — only signature-band collisions shuffle, the
    * classic sub-quadratic near-dup candidate generator. Both join sides
    * share one physical subplan (exchange reuse), so signatures are
    * computed once. Returns candidate pairs with agreeing-band counts. */
  def lshCandidates(documents: DataFrame, k: Int = 12,
      rowsPerBand: Int = 3): DataFrame = {
    val banded = withMinhash(documents, k, rowsPerBand)
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "digest")))
    banded.toDF("doc_a", "band", "digest")
      .join(banded.toDF("doc_b", "band_b", "digest_b"),
        col("band") === col("band_b") && col("digest") === col("digest_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** p15: the SOURCE×SOURCE near-dup OVERLAP MATRIX — the datasheet row
    * p14's per-source card is missing: which sources copy which
    * (Datasheets for Datasets' provenance-overlap question; Dolma and
    * the C4/Pile analyses report exactly this cross-source duplication
    * table before fixing mixture weights, because budgeting two sources
    * as independent when one mirrors the other double-counts content).
    * For every unordered source pair: MinHash-band candidate pair count
    * (the d04 estimator — band collision ≈ Jaccard above the band
    * threshold), the distinct documents of each side involved, source
    * sizes, and the involved fraction per side (frac_a = what share of
    * source_a has a near-dup in source_b — the "who copies whom"
    * number; for the diagonal both sides read the same involved-doc
    * union).
    *
    * Candidates are CAPPED by the d11 discipline (`maxBucket`, default
    * [[DefaultMaxDocFreq]]): a (band, digest) bucket larger than the
    * cap is boilerplate-density enumeration (Θ(cap²) pairs of near-zero
    * provenance signal) and is dropped whole; the recall cost is pairs
    * whose EVERY agreeing band is over-cap — the d02/d04 trade,
    * documented there. Pass None for exact banding.
    *
    * Scale: signatures are [[withMinhash]]'s one relational pass; the
    * banded self-join shuffles only band collisions (both sides reuse
    * one exchange); pair→source attribution is two joins against the
    * (doc_id, source) projection; everything after is agg over ≤
    * |sources|² rows with broadcast size joins. */
  def sourceOverlapMatrix(documents: DataFrame,
      maxBucket: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    val banded = withMinhash(documents)
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band", "digest")))
    // the cap rides the SAME (band, digest) exchange the self-join
    // needs: a whole-partition window count + filter (the m05 lesson —
    // a separate groupBy+anti-join pays a second aggregate for nothing)
    val capped = maxBucket match {
      case None => banded
      case Some(cap) =>
        banded.withColumn("_df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("digest"))))
          .filter(col("_df") <= cap)
          .select(col("doc_id"), col("band"), col("digest"))
    }
    val pairs = capped.toDF("doc_a", "band", "digest")
      .join(capped.toDF("doc_b", "band_b", "digest_b"),
        col("band") === col("band_b") &&
          col("digest") === col("digest_b") &&
          col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val withSrc = pairs
      .join(src.toDF("doc_a", "src_a"), "doc_a")
      .join(src.toDF("doc_b", "src_b"), "doc_b")
      .select(
        least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"),
        when(col("src_a") <= col("src_b"), col("doc_a"))
          .otherwise(col("doc_b")).as("d_a"),
        when(col("src_a") <= col("src_b"), col("doc_b"))
          .otherwise(col("doc_a")).as("d_b"))
    val nPairs = withSrc.groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    // role rows: on the diagonal a pair's BOTH docs belong to the one
    // source, so both feed both sides' involved-doc counts (the union)
    val roles = withSrc.select(col("source_a"), col("source_b"),
        explode(when(col("source_a") === col("source_b"),
          array(struct(lit("a").as("role"), col("d_a").as("doc")),
            struct(lit("a").as("role"), col("d_b").as("doc")),
            struct(lit("b").as("role"), col("d_a").as("doc")),
            struct(lit("b").as("role"), col("d_b").as("doc"))))
          .otherwise(
            array(struct(lit("a").as("role"), col("d_a").as("doc")),
              struct(lit("b").as("role"), col("d_b").as("doc")))))
          .as("r"))
      .select(col("source_a"), col("source_b"),
        col("r.role").as("role"), col("r.doc").as("doc"))
    val nDocs = roles.groupBy(col("source_a"), col("source_b"))
      .agg(
        countDistinct(when(col("role") === "a", col("doc")))
          .as("n_docs_a"),
        countDistinct(when(col("role") === "b", col("doc")))
          .as("n_docs_b"))
    val sizes = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("sz"))
    nPairs.join(nDocs, Seq("source_a", "source_b"))
      .join(broadcast(sizes.toDF("source_a", "size_a")), "source_a")
      .join(broadcast(sizes.toDF("source_b", "size_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        col("n_docs_a"), col("n_docs_b"), col("size_a"), col("size_b"),
        (col("n_docs_a").cast("double") / col("size_a").cast("double"))
          .as("frac_a"),
        (col("n_docs_b").cast("double") / col("size_b").cast("double"))
          .as("frac_b"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Incremental exact dedup — the production shape: a NEW batch arrives
    * and must be deduped against the corpus WITHOUT rescanning it. The
    * corpus is represented by its digest index (content_md5 → kept
    * doc_id), typically a bucketed table at scale so this join is
    * exchange-free on the index side. Returns (acceptedRows,
    * digestIndexAdditions): rows new to both the index and the batch
    * (lowest doc_id wins within the batch), plus the index rows to
    * append for the next increment. */
  def incrementalExactDedup(newBatch: DataFrame,
      digestIndex: DataFrame): (DataFrame, DataFrame) = {
    val hashed = newBatch.withColumn("content_md5",
      contentDigest(col("text")))
    val notInCorpus = hashed.join(digestIndex.select(col("content_md5")),
      Seq("content_md5"), "left_anti")
    val firstPerDigest = notInCorpus
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("doc_id"))
    // dropDuplicates: fully identical batch rows (same doc_id AND text)
    // would otherwise both match the winner and be emitted twice
    val accepted = notInCorpus
      .join(firstPerDigest, Seq("content_md5", "doc_id"))
      .dropDuplicates("content_md5")
    (accepted.select(col("doc_id"), col("text")),
      firstPerDigest.select(col("content_md5"), col("doc_id")))
  }

  /** 64-bit frequency-weighted SimHash over whitespace tokens, emitted as a
    * 64-char bit string. Bit j of a token's hash is drawn from hex digit
    * j/4 of its md5; per-bit ±1 votes are summed over all tokens (dupes
    * weight naturally) and the sign becomes the fingerprint bit.
    *
    * Relational formulation (explode tokens → hash once per token → explode
    * 64 bit positions → shuffle-sum votes → reassemble): md5 is computed
    * once per token instead of 64×, and the work distributes by row count —
    * same rationale as [[withMinhash]]. */
  def simhash(documents: DataFrame): DataFrame = {
    val votes = spread(documents)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .withColumn("j", explode(sequence(lit(0), lit(63))))
      .select(col("doc_id"), col("j"), expr(
        """CASE WHEN
          |  ((locate(substr(h, 1 + (j div 4), 1), '0123456789abcdef') - 1)
          |    div (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4
          |         WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
          |THEN 1 ELSE -1 END""".stripMargin).as("vote"))
    votes
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("vote")).as("v"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("j"), col("v")))),
        s => when(s.getField("v") > 0, "1").otherwise("0")), "")
        .as("simhash64"))
      .orderBy(col("doc_id"))
  }

  /** Exact double-precision dot product with a fixed left-to-right fold —
    * bitwise reproducible across engines (same order, same widening).
    * Backed by the native codegen'd [[graft.functions.DotProduct]]; the
    * builtin `aggregate(zip_with(...))` formulation computes the identical
    * value but runs interpreted per element (~10× slower on 64-dim). */
  def dotExpr(a: String, b: String): Column =
    graft.functions.VectorOps.dot(col(a), col(b))

  /** Connected-component cluster formation over near-dup pairs — the step
    * AFTER candidate generation in every dedup pipeline: pairs only say
    * "a≈b", but keep-one-per-group needs the transitive closure
    * (a≈b, b≈c ⇒ {a,b,c} is ONE cluster, even though a,c were never
    * compared). Iterative min-label propagation, the standard distributed
    * CC algorithm: each round every node adopts the smallest label among
    * itself and its neighbors, converging in graph-diameter rounds.
    *
    * Scale posture: every round is one shuffle join keyed by node id plus
    * one aggregation — no component is ever materialized on a single
    * machine, so a 100M-node duplicate graph distributes evenly. Labels
    * are anchored per round ([[Anchor]] — reliable checkpoint when a dir
    * is set, else localCheckpoint) to truncate lineage (20 rounds of
    * stacked joins would otherwise blow up the plan).
    *
    * ITERATION COST IS THE BUDGET, not the per-round shuffle: the min
    * label reaches a node in exactly its hop distance from the
    * component's minimum-id member, so rounds-to-converge = the max such
    * eccentricity over all components (≤ the largest component's
    * diameter), plus ONE quiet round for the `changed` counter to read
    * zero — a diameter-d path graph costs d+1 rounds, each a full
    * edge-table shuffle plus a driver-side scalar `count()` (the
    * accepted control-loop pattern for iterative Spark; see
    * TextDedupSpec's path-graph bound test). Near-dup graphs in
    * practice are dense, tiny-diameter duplicate groups → a handful of
    * rounds; a pathological chain topology instead exhausts `maxIters`
    * and fails loudly rather than returning partial labels. At 100 TB,
    * budget by graph shape: cap chain formation upstream (e.g. d09-style
    * blocking bounds component diameter) before raising maxIters.
    *
    * Deterministic output: cluster_id = min member id; is_canonical marks
    * the one row per cluster a dedup keep-filter would retain. */
  def dedupClusters(pairs: DataFrame, aCol: String = "vec_id_a",
      bCol: String = "vec_id_b", maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .anchored
    // PeriodicCheckpointer discipline (Anchor.Loop): each round's anchor
    // supersedes the last — release it, or 50 rounds pile 50 full label
    // materializations into the fault-tolerant checkpoint store.
    val loop = new Anchor.Loop
    var labels = loop.cut(edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges.join(labels, edges("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("lbl")).as("nbr_lbl"))
      val next = loop.cut(
        labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
          .select(col("id"), col("lbl").as("old_lbl"),
            least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl")))
              .as("lbl")))
      changed = next.filter(col("lbl") =!= col("old_lbl")).count()
      labels = next.select(col("id"), col("lbl"))
      it += 1
    }
    require(changed == 0, s"label propagation did not converge in $maxIters rounds")
    Anchor.release(edges) // loop-invariant; dead once the last round lands
    labels
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"),
        (col("id") === col("lbl")).as("is_canonical"))
      .orderBy(col("vec_id"))
  }

  /** d20: connected components by TWO-PHASE STAR CONTRACTION (Kiveris
    * et al. 2014, "Connected Components in MapReduce and Beyond" —
    * the alternating large-star/small-star algorithm, also the engine
    * behind GraphFrames' `connectedComponents`). Same contract as
    * [[dedupClusters]] (cluster_id = min member id, is_canonical on
    * the minimum), different convergence law: label propagation needs
    * DIAMETER rounds (a 1M-node duplicate chain = 1M shuffles), star
    * contraction provably converges in O(log² n) rounds regardless of
    * topology — each large-star hangs every node's larger neighbors
    * off its local minimum, each small-star collapses the smaller
    * neighborhood onto it, so component depth roughly halves per
    * round. At 100 TB this is the CC you run when you CANNOT bound
    * the duplicate-graph diameter upstream (d07's documented budget
    * assumption).
    *
    * Representation: canonical undirected edges (hi > lo), distinct.
    * Large-star emits, for every canonical edge, (hi, m_lo) where
    * m_lo = min(Γ(lo) ∪ {lo}) over the SYMMETRIC neighborhood — one
    * neighborhood-min aggregate + one join, orientation preserved
    * because m_lo ≤ lo < hi. Small-star re-hangs each node's smaller
    * neighbors (and itself) onto its smallest neighbor — one
    * per-hi min aggregate + one join. Both are key-partitioned
    * shuffles with map-side-combining MINs; a web-scale boilerplate
    * hub (one node in millions of pairs) is a hot GROUP BY key — AQE
    * skew territory — never a collected adjacency list.
    *
    * Convergence check per round: anchored edge-set counts (cheap on
    * the materialized anchor), then a one-sided `exceptAll` only when
    * counts tie — two distinct sets of equal size with empty
    * difference are EQUAL, so the fixed point is detected exactly,
    * never by a hash signature that could collide silently. Rounds
    * are [[Anchor.Loop]]-cut (PeriodicCheckpointer discipline).
    *
    * Fixed point: the graph is a forest of stars centered at each
    * component's minimum, so labels read directly off the edge list
    * (hi → lo); roots and never-paired nodes label themselves. */
  def starContraction(pairs: DataFrame, aCol: String = "vec_id_a",
      bCol: String = "vec_id_b", maxIters: Int = 30): DataFrame = {
    // nodes is ANCHORED, not left lazy over `pairs`: the result frame
    // joins against it, and an unanchored node set would re-run the
    // whole upstream candidate-pair computation (for d20 that is the
    // near-dup join — the most expensive stage of the pipeline) on
    // EVERY downstream action. Node-count-sized, materialized once.
    val nodes = Anchor.cut(pairs.select(col(aCol).as("vec_id"))
      .union(pairs.select(col(bCol).as("vec_id"))).distinct())
    // edge anchors are managed manually, NOT via Anchor.Loop: the
    // convergence check reads the PREVIOUS round's anchor after the
    // new one materializes, so release must wait until the compare
    // is done (Loop.cut would release it at cut time)
    var cur = Anchor.cut(pairs
      .select(greatest(col(aCol), col(bCol)).as("hi"),
        least(col(aCol), col(bCol)).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct())
    var curCount = cur.count()
    var converged = curCount == 0L
    var it = 0
    while (!converged && it < maxIters) {
      // large-star: m_u = min over the symmetric neighborhood ∪ self;
      // each canonical edge (hi, lo) re-hangs hi onto m_lo
      val mins = cur.select(col("hi").as("u"), col("lo").as("v"))
        .union(cur.select(col("lo").as("u"), col("hi").as("v")))
        .groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val e1 = cur.join(mins, cur("lo") === mins("u"))
        .select(col("hi"), col("m").as("lo")).distinct()
      // small-star: hang each node's smaller neighbors AND itself onto
      // its smallest neighbor (all strictly smaller, so m < hi)
      val smins = e1.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val joined = e1.join(smins, "hi")
      val next = Anchor.cut(joined
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(joined.select(col("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo")).distinct())
      val nextCount = next.count()
      converged = nextCount == curCount &&
        next.exceptAll(cur).isEmpty
      Anchor.release(cur) // compare done — NOW the old round is dead
      cur = next
      curCount = nextCount
      it += 1
    }
    require(converged, s"star contraction did not converge in $maxIters rounds")
    val nonRoots = cur
      .select(col("hi").as("vec_id"), col("lo").as("cluster_id"))
    val roots = nodes.join(nonRoots.select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("vec_id").as("cluster_id"))
    // the result is lazy over the loop's FINAL anchor (cur) and the
    // nodes anchor — neither is released here; d07's contract note
    // applies identically
    nonRoots.union(roots)
      .select(col("vec_id"), col("cluster_id"),
        (col("vec_id") === col("cluster_id")).as("is_canonical"))
      .orderBy(col("vec_id"))
  }

  /** d10: the keep-list — the artifact a dedup stage actually publishes:
    * one row per CORPUS document with its cluster and a keep/drop
    * decision. [[dedupClusters]] labels only documents that appear in a
    * near-dup pair; every other document is its own singleton cluster
    * (`cluster_id = doc_id`). Keep rule: the longest member wins
    * (`n_chars` max — the standard "keep the fullest version" heuristic),
    * ties broken by lowest doc_id, so the decision is deterministic with
    * no float comparison anywhere.
    *
    * Scale shape: the cluster table is proportional to NEAR-DUP members
    * (a small fraction of the corpus), the left join hits the corpus
    * once on its key, and both reductions (per-cluster best, per-cluster
    * keeper) partial-aggregate map-side. Nothing is quadratic and no
    * row carries text — only (doc_id, cluster_id, n_chars). */
  def canonicalKeepList(documents: DataFrame,
      clusters: DataFrame): DataFrame = {
    val withCluster = documents.select(col("doc_id"), col("n_chars"))
      .join(clusters.select(col("vec_id").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val best = withCluster.groupBy(col("cluster_id")).agg(
      count(lit(1)).as("n_members"),
      max(col("n_chars")).as("max_chars"))
    val keeper = withCluster.join(best, Seq("cluster_id"))
      .filter(col("n_chars") === col("max_chars"))
      .groupBy(col("cluster_id")).agg(min(col("doc_id")).as("keep_id"))
    withCluster
      .join(best, Seq("cluster_id"))
      .join(keeper, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"),
        (col("doc_id") === col("keep_id")).as("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dup pairs, blocked by a bucketing column (the
    * IVF-style scale path: only same-bucket pairs are compared, so the
    * cross product is per-bucket, not global). Cosine computed in double
    * with deterministic fold order. */
  def embeddingNearDups(embeddings: DataFrame, bucketCol: String = "label",
      threshold: Double = 0.35): DataFrame = {
    val withNorm = embeddings.select(col("vec_id"), col(bucketCol),
      col("embedding"), dotExpr("embedding", "embedding").as("norm2"))
    withNorm.toDF("vec_id_a", "bucket", "emb_a", "norm2_a")
      .join(withNorm.toDF("vec_id_b", "bucket_b", "emb_b", "norm2_b"),
        col("bucket") === col("bucket_b") && col("vec_id_a") < col("vec_id_b"))
      .select(col("vec_id_a"), col("vec_id_b"), col("bucket"),
        (dotExpr("emb_a", "emb_b") /
          (sqrt(col("norm2_a")) * sqrt(col("norm2_b")))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_id_a"), col("vec_id_b"))
  }

  /** d15: SemDeDup-style SEMANTIC dedup — near-duplicate pruning where
    * the blocker is a TRAINED clustering of the embedding space rather
    * than a fixture label (d06) or a hash bucket: k-medians cluster the
    * corpus (the s08/s14 trained coarse quantizer, loaded via
    * [[ModelArtifacts]]), compare pairs only WITHIN a cluster, and drop
    * every vector that has an earlier (lower vec_id) same-cluster
    * member above the cosine threshold — the deterministic keeper rule
    * (published SemDeDup keeps one member per duplicate group in
    * arbitrary order; index order makes the choice engine-stable and
    * oracle-checkable).
    *
    * Scale shape is the published method's own argument: all-pairs over
    * the corpus is unthinkable at 100 TB, all-pairs within a cluster is
    * |cluster|² — the clustering IS the blocking, and K grows with the
    * corpus (√n clusters keeps per-cluster work flat). Training costs
    * one session-cached pass; the dedup itself is one cluster-keyed
    * self-join, partitioned by cluster_id, nothing global. */
  def semanticDedup(embeddings: DataFrame,
      threshold: Double = 0.35): DataFrame = {
    val centroids = Clustering.cachedCentroids(embeddings, 8)
    val vectors = embeddings.select(col("vec_id"),
        col("embedding").as("emb"))
      .withColumn("vnorm2", dotExpr("emb", "emb"))
    val assigned = Clustering.assign(vectors, centroids)
      .select(col("vec_id"), col("cluster_id"), col("emb"), col("vnorm2"))
    val dups = assigned.toDF("vec_id_a", "cluster_id", "emb_a", "norm2_a")
      .join(assigned.toDF("vec_id_b", "cluster_b", "emb_b", "norm2_b"),
        col("cluster_id") === col("cluster_b") &&
          col("vec_id_b") < col("vec_id_a"))
      .filter(dotExpr("emb_a", "emb_b") /
        (sqrt(col("norm2_a")) * sqrt(col("norm2_b"))) >= threshold)
      .select(col("vec_id_a").as("vec_id")).distinct()
      .withColumn("dup", lit(true))
    assigned
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        col("dup").isNull.as("is_kept"))
      .orderBy(col("vec_id"))
  }

  /** p18: SEMANTIC DECONTAMINATION — the embedding-space face of the
    * p02 (exact n-gram) / p05 (MinHash paraphrase) decontamination
    * ladder: flag every TRAINING vector whose cosine against ANY held-out
    * eval vector clears `threshold`, and report the nearest eval item
    * and the margin so borderline leaks can be adjudicated (the check
    * LLM eval cards run after exact and fuzzy overlap, catching
    * translations/heavy paraphrases that share no surface n-grams —
    * e.g. the GPT-4/Llama report contamination appendices).
    *
    * Plan shape: the eval side of a real decontamination pass is a
    * BOUNDED benchmark artifact (10³–10⁵ vectors — it is the thing
    * being protected, not the corpus), so it BROADCASTS and the train
    * side streams once: an intended broadcast nested-loop (the s01
    * flat-search stance), one bounded per-vector max/argmax partial
    * agg, no shuffle of the corpus. If the eval side ever outgrows a
    * broadcast, the d15 discipline applies verbatim: assign both sides
    * to the trained coarse cells and join on cell_id, trading
    * cross-cell misses for an equi-join. Here the eval slice is the
    * fixture's `vec_id % 100 = 0` (the p02/p06 eval-predicate
    * convention).
    *
    * Determinism: cosine is the exact [[dotExpr]] fold over doubles;
    * max is selection (order-free); the argmax breaks cosine ties
    * toward the LOWER eval id via the min_by-on-struct pattern —
    * bitwise identical to the oracle's (cosine DESC, eval_id ASC)
    * row_number pick. */
  def semanticDecontam(embeddings: DataFrame,
      evalPredicate: Column, threshold: Double = 0.35): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("embedding"),
      dotExpr("embedding", "embedding").as("norm2"))
    val eval = v.filter(evalPredicate)
      .select(col("vec_id").as("eval_id"), col("embedding").as("qemb"),
        col("norm2").as("qnorm2"))
    val train = v.filter(!evalPredicate)
    train.crossJoin(broadcast(eval))
      .select(col("vec_id"), col("eval_id"),
        (dotExpr("embedding", "qemb") /
          (sqrt(col("norm2")) * sqrt(col("qnorm2")))).as("cosine"))
      .groupBy(col("vec_id"))
      .agg(max(col("cosine")).as("max_cos"),
        min_by(col("eval_id"), struct(
          (lit(0.0) - col("cosine")).as("negcos"),
          col("eval_id").as("e"))).as("nearest_eval_id"))
      .select(col("vec_id"), col("nearest_eval_id"), col("max_cos"),
        (col("max_cos") >= lit(threshold)).as("contaminated"))
      .orderBy(col("vec_id"))
  }

  /** d16: cross-document EXACT-substring duplication — the window form
    * of Lee et al. 2022's exact-substring dedup ("Deduplicating
    * Training Data Makes Language Models Better"): two documents share
    * a duplicated `window`-token SPAN iff some rolling fingerprint
    * collides, which catches verbatim quotation/boilerplate reuse that
    * set-based Jaccard (d02) dilutes away and doc-level containment
    * (d12) only sees in aggregate. Fingerprints are the codegen'd
    * [[graft.functions.RollFns.rollingHash]] (t30's O(tokens)
    * Rabin–Karp — no window strings ever materialize); a hash
    * collision without a true shared span is possible at the usual
    * 1/2³¹ rate — the standard probabilistic trade, same family as
    * MinHash, and candidates feed an exact verify pass when stakes
    * demand it.
    *
    * Plan shape: one fingerprint posting pass (distinct per doc), the
    * [[DefaultMaxDocFreq]] posting cap bounding any hot window's
    * self-join at cap²/2 (the d04/d12 discipline), inverted-index
    * a<b pair counting, then the TRUE per-doc distinct-window sizes
    * (pre-cap — an honest denominator) broadcast back for the
    * containment share: one double division of exact longs. */
  def substringDups(documents: DataFrame, window: Int = 5,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val wh = spread(documents).select(col("doc_id"),
      array_distinct(graft.functions.RollFns
        .rollingHash(col("text"), window)).as("whs"))
    val sizes = wh.select(col("doc_id"),
      size(col("whs")).cast("long").as("n_windows"))
    val posts0 = wh.select(col("doc_id"), explode(col("whs")).as("wh"))
    val posts = maxDocFreq match {
      case None => posts0
      case Some(cap) =>
        val hot = posts0.groupBy(col("wh")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select(col("wh"))
        posts0.join(hot, Seq("wh"), "left_anti")
          .select(col("doc_id"), col("wh"))
    }
    val pairs = posts.select(col("doc_id").as("doc_a"), col("wh"))
      .join(posts.select(col("doc_id").as("doc_b"),
        col("wh").as("wh_b")),
        col("wh") === col("wh_b") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("n_windows").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("n_windows").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d19: cross-document duplicate-SPAN removal — the applied face of
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": the step that actually CUTS
    * repeated spans, where d16 only reports which docs share them).
    * A `window`-token span is duplicated when its rolling fingerprint
    * occurs in ≥2 distinct documents; the MIN-doc_id holder of each
    * fingerprint is its owner and keeps every occurrence, every other
    * document drops all tokens covered by any duplicated window —
    * first occurrence survives, the boilerplate tail is excised.
    * Within-doc repeats in the owner are deliberately kept (within-doc
    * repetition is t05/t32's signal, not cross-doc contamination).
    * Docs shorter than `window` tokens are untouched (the whole-doc
    * fallback hash never enters the posting table).
    *
    * Emits per doc: n_tokens, n_dup_windows (flagged starts),
    * n_removed (covered positions), and md5 of the rebuilt kept text
    * (the t36 cleaned-doc contract — reassembly order and the
    * everything-removed edge are where span cutters break; empty
    * survivors hash '' via coalesce).
    *
    * Scale posture — why removal needs NO posting cap where d16's
    * pairing does: pairing is quadratic in a fingerprint's document
    * frequency (df² pairs per hot window — hence d16's cap), but
    * removal touches each occurrence ONCE — the dup table is one
    * (wh → owner) row regardless of df and the join back fans out
    * linearly in occurrences, which is the work any cutter must do to
    * cut. Plan: one O(tokens) codegen'd fingerprint scan (graft_
    * rollhash), two wh-keyed shuffles (ownership agg + flag join, AQE
    * skew territory for boilerplate windows exactly like t09's hot
    * bigrams), a (doc, pos)-keyed coverage distinct + anti-join, and
    * one doc-keyed rebuild agg whose state is bounded by document
    * length (the t36 sort_array reassembly). Nothing quadratic
    * anywhere, no recall trade. */
  def removeDuplicateSpans(documents: DataFrame,
      window: Int = 5): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val base = spread(documents).select(col("doc_id"), col("text"),
      size(toks).cast("long").as("n_tokens"))
    val wh = base.filter(col("n_tokens") >= window)
      .select(col("doc_id"), posexplode(
        graft.functions.RollFns.rollingHash(col("text"), window))
        .as(Seq("i", "wh")))
    val dup = wh.select(col("doc_id"), col("wh")).distinct()
      .groupBy(col("wh"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .filter(col("df") >= 2)
    val flagged = wh.join(dup.select(col("wh"), col("owner")), Seq("wh"))
      .filter(col("doc_id") =!= col("owner"))
    val dupWin = flagged.groupBy(col("doc_id"))
      .agg(count_distinct(col("i")).as("n_dup_windows"))
    val removedPos = flagged
      .select(col("doc_id"),
        explode(sequence(col("i").cast("long"),
          col("i").cast("long") + lit(window - 1L))).as("pos"))
      .distinct()
    val removedCnt = removedPos.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"))
    val tokPos = base
      .select(col("doc_id"), posexplode(toks).as(Seq("p", "tok")))
      .select(col("doc_id"), col("p").cast("long").as("pos"), col("tok"))
    val kept = tokPos
      .join(removedPos, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ").as("kept_text"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(dupWin, Seq("doc_id"), "left")
      .join(removedCnt, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(coalesce(col("kept_text"), lit(""))).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  /** d17: prefix-filtered set-similarity join (the PPJoin family, Xiao
    * et al. 2008; AllPairs, Bayardo et al. 2007) — EXACT Jaccard join
    * without d02's full inverted index OR its posting cap: order every
    * doc's shingles by ascending global document frequency (rarest
    * first, lexicographic ties) and index only each doc's PREFIX — the
    * first `n − ⌈t·n⌉ + 1` shingles in that order. Pigeonhole: two sets
    * with Jaccard ≥ t must overlap in ≥ ⌈t·n⌉ elements, so they cannot
    * BOTH avoid each other's prefix — candidate generation from prefix
    * postings alone has no false negatives (spec: result set equals
    * d02's uncapped join exactly). The length filter (t·|A| ≤ |B| ≤
    * |A|/t) prunes size-incompatible candidates before verification,
    * and the POSITIONAL filter (the ppjoin upper bound proper) prunes
    * pairs whose prefix-match positions already cap the achievable
    * overlap below α = ⌈t·(|A|+|B|)/(1+t)⌉ — both lossless, both
    * applied before the verify join pays for the pair.
    *
    * WHY this beats the cap at scale: d02's hot-posting problem is
    * FREQUENT shingles exploding the self-join, and the df-ascending
    * ordering pushes exactly those out of every prefix — boilerplate
    * prunes itself, with zero recall loss (the cap trades recall; the
    * prefix trades nothing). Verification touches only candidate
    * pairs: Σ_cand |A| rows, never the all-pairs product.
    *
    * Plan shape: one shingle-keyed df count + join back (AQE-skew
    * territory, same as t09), a doc-partitioned rank window (parallel),
    * the prefix self-join (postings ≈ half each doc's rare tail), then
    * the PPJoin+ VERIFY: per-doc sorted shingle arrays joined onto the
    * candidate pairs and one codegen'd suffix-filtered merge per pair
    * ([[graft.functions.SuffixVerify]]) — exact intersection for
    * survivors, earliest-provable abandonment for the rest. One double
    * division per surviving pair. */
  def ppjoinPairs(documents: DataFrame, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // referenced 4x (df count, sizes, rank, verify arrays) — the
    // checkpoint trades one postings materialization for four shingle
    // explodes; measured NEUTRAL at sf0.1 (the explode is not the
    // dominant stage — the rank/verify shuffles are), kept for the
    // lineage fan-out
    val post = shinglePostings(documents, n, None).anchored
    val dfreq = post.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val ranked = post.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("shingle"))).cast("long"))
    val pref = ranked.join(sizes, "doc_id")
      .filter(col("rk") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh")).cast("long") + 1)
      .select(col("doc_id"), col("shingle"), col("rk"), col("n_sh"))
    // POSITIONAL filter (Xiao et al. 2008 §3.2, relational form): the
    // prefix postings carry (rank, size), so a prefix match of shingle
    // x at positions (pa, pb) bounds the FULL overlap — under the one
    // global df-ascending order, common elements ≤ x sit at positions
    // ≤ pa in A and ≤ pb in B (≤ min(pa,pb) of them, x included), and
    // common elements > x at positions > pa and > pb (≤ min(n_a−pa,
    // n_b−pb)). Every match yields a valid bound, so min-over-matches
    // is one; a pair survives only if that bound reaches the overlap
    // threshold α = ⌈t·(n_a+n_b)/(1+t)⌉ (Jaccard ≥ t ⇔ ∩ ≥ α). The
    // 1e-9 slack keeps ceil from rounding a float-boundary α UP past
    // the exact value — it can only weaken pruning, never drop a true
    // pair, so exactness is invariant (the d02-equality spec stands).
    // The length filter runs on the match rows too: sizes ride the
    // postings, replacing the two post-distinct joins against `sizes`.
    val cand = pref.toDF("doc_a", "shingle", "rk_a", "n_a")
      .join(pref.toDF("doc_b", "shingle_b", "rk_b", "n_b"),
        col("shingle") === col("shingle_b") && col("doc_a") < col("doc_b"))
      .filter(lit(threshold) * col("n_a") <= col("n_b") &&
        lit(threshold) * col("n_b") <= col("n_a"))
      .withColumn("ub", least(col("rk_a"), col("rk_b")) +
        least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b")))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("ub")).as("min_ub"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"))
      .filter(col("min_ub") >=
        ceil(lit(threshold) * (col("n_a") + col("n_b")) /
          (lit(1.0) + lit(threshold)) - lit(1e-9)).cast("long"))
      .select(col("doc_a"), col("doc_b"))
    // VERIFY = suffix-filtered sorted-merge (Xiao 2008 §4, the
    // PPJoin+ step; [[graft.functions.SuffixVerify]]): each doc's
    // surviving shingle set rides ONCE as a sorted array into the
    // candidate pairs, and one codegen'd merge per pair either proves
    // the pair under-threshold at the earliest positional bound
    // (−1, the suffix filter) or returns its EXACT intersection.
    // Replaces the exploded per-candidate double join + groupBy
    // (Σ_cand(|A|+|B|) shuffled rows) with two doc-keyed array joins
    // and a map-side loop — the shuffles move each doc's set once per
    // pair membership, and nothing re-aggregates.
    val docArr = post.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("shingle"))).as("arr"))
    cand
      .join(docArr.toDF("doc_a", "arr_a"), "doc_a")
      .join(docArr.toDF("doc_b", "arr_b"), "doc_b")
      .withColumn("inter", graft.functions.SuffixVerifyFns
        .suffixVerify(col("arr_a"), col("arr_b"), threshold))
      .filter(col("inter") >= 0L)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (size(col("arr_a")).cast("long") + size(col("arr_b")).cast("long")
            - col("inter")).cast("double"))
          .as("jaccard"))
      // final EXACT threshold gate: SuffixVerify's integer accept gate
      // shares the candidate stage's 1e-9 ceil slack, which weakens
      // the ACCEPT side too — at a threshold where t·(|A|+|B|)/(1+t)
      // lands within 1e-9 above an integer, a pair with Jaccard
      // marginally below t could slip through the relaxed α. This
      // one cheap row-local comparison restores exactness for ANY t
      // (survivor rows only; the pruning stages stay slack-relaxed,
      // which can only admit extra candidates, never drop true pairs).
      .filter(col("jaccard") >= lit(threshold))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** d18's deterministic messy-URL synthesis from a doc id (the fixture
    * carries no url column): five variant shapes per 5-block — within
    * each block, variants 0+1 and 2+3 canonicalize together and 4 is a
    * distinct subdomain. Mirrored verbatim in the d18/p10 oracle SQL,
    * so the canonicalization logic is what the oracle actually checks. */
  def syntheticUrl(docId: Column): Column = {
    // integer division via double-divide + truncating cast: ids stay
    // far below 2^53, so the quotient can't cross an integer boundary
    val h = (docId / 50).cast("long").cast("string")
    val grp = (docId / 5).cast("long").cast("string")
    when(docId % 5 === 0,
        concat(lit("https://EXAMPLE"), h, lit(".COM/Page/"), grp))
      .when(docId % 5 === 1,
        concat(lit("https://www.example"), h, lit(".com/Page/"), grp,
          lit("/")))
      .when(docId % 5 === 2,
        concat(lit("http://example"), h, lit(".com/Page/"), grp,
          lit("?utm_source=feed&ref=rss")))
      .when(docId % 5 === 3,
        concat(lit("https://example"), h, lit(".com/Page/"), grp,
          lit("?ref=rss&utm_campaign=x#section-2")))
      .otherwise(
        concat(lit("https://blog.example"), h, lit(".com/Page/"), grp))
  }

  /** The d18 canonicalization rule set as one pure Column expression
    * (testable on handcrafted URLs, reused by [[urlDedup]]): host
    * lowercased and one leading `www.` stripped, path trailing slash
    * stripped (path case preserved — it is significant), fragment
    * dropped, `utm_*` tracking params dropped, surviving params sorted
    * bytewise, scheme dropped (http/https unified). All codegen'd
    * string/regexp/array builtins — a map-side expression. */
  def canonicalUrl(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z]+://([^/?#]+)", 1)),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1), "/$", "")
    val params = array_join(array_sort(filter(
      split(regexp_extract(url, "^[^?#]*\\?([^#]*)", 1), "&"),
      p => p =!= lit("") && !p.startsWith("utm_"))), "&")
    concat(host, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** PSL-lite: the most common MULTI-LABEL public suffixes, embedded
    * as literals (the full Public Suffix List is not available
    * offline; this covers the high-traffic ccTLD second-level zones).
    * A host ending in one of these registers at the THIRD label —
    * without it, `a.co.uk` and `b.co.uk` silently merge into `co.uk`
    * for per-site caps. The SAME list builds the oracle's regex
    * (assembled from this value in SparkEntry — cannot drift). */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp",
    "co.nz", "org.nz", "net.nz",
    "com.br", "com.cn", "com.mx", "com.ar", "com.sg",
    "com.tr", "com.hk", "co.in", "co.za", "co.kr")

  /** The suffix alternation as a regex fragment (dots escaped). */
  val MultiLabelSuffixRegex: String =
    "(?:" + MultiLabelSuffixes.map(_.replace(".", "\\.")).mkString("|") +
      ")"

  /** Registered domain of the canonical host: label + multi-label
    * public suffix when the host ends in a PSL-lite entry (so
    * `blog.example.co.uk` → `example.co.uk`), else the last two labels
    * (`blog.example.com` → `example.com`). The per-site key for
    * t19-style domain caps. One regexp per branch — map-side. */
  def registeredDomain(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z]+://([^/?#]+)", 1)),
      "^www\\.", "")
    val psl = regexp_extract(host,
      s"([^.]+\\.$MultiLabelSuffixRegex)$$", 1)
    when(psl =!= "", psl)
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }

  /** d18: URL canonicalization + URL-level first-occurrence dedup —
    * the web-pipeline gate BOTH C4 (Raffel et al. 2020) and CCNet
    * (Wenzek et al. 2020) run before any content dedup: a crawl sees
    * the same page under scheme/case/www/trailing-slash/tracking-param
    * variants, and deduping by the CANONICAL form removes the bulk of
    * exact re-crawls for the price of one string expression. Rules
    * (each a documented choice, mirrored verbatim in the oracle SQL):
    * lowercase the host, strip one leading `www.`, strip a trailing
    * slash from the path (path CASE is preserved — it is significant),
    * drop the fragment, drop `utm_*` tracking params, sort the
    * surviving query params bytewise, and unify http/https by dropping
    * the scheme. The registered domain (last two host labels — no
    * public-suffix list offline, documented approximation) rides along
    * for per-site caps (t19's key).
    *
    * The fixture carries no url column, so a deterministic messy URL
    * is synthesized from doc_id (five variant shapes; within each
    * 5-block, variants 0+1 and 2+3 canonicalize together and 4 is a
    * distinct subdomain) — the SAME construction in both engines, so
    * the canonicalization logic is what the oracle actually checks.
    *
    * Keep rule: first occurrence (MIN doc_id) per canonical URL — the
    * t39 keeper shape. Plan: one map-side canon expression, one
    * canon-keyed partial agg (map-side combined), one canon-keyed join
    * back — two shuffles on the canon key, AQE-skew territory for a
    * hot URL exactly like t39's hot line. */
  def urlDedup(documents: DataFrame): DataFrame = {
    val withUrl = documents.select(col("doc_id"),
      syntheticUrl(col("doc_id")).as("url"))
    val canon = withUrl
      .select(col("doc_id"), col("url"),
        canonicalUrl(col("url")).as("canon_url"),
        registeredDomain(col("url")).as("domain"))
    val keeper = canon.groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_dups"))
    canon.join(keeper, "canon_url")
      .select(col("doc_id"), col("url"), col("canon_url"), col("domain"),
        col("keep_doc_id"), col("n_dups"),
        (col("doc_id") === col("keep_doc_id")).as("is_kept"))
      .orderBy(col("doc_id"))
  }
}
