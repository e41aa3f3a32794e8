package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling and data-mixing operators for LLM training pipelines:
  * deterministic stratified downsampling (keep X% of each language /
  * source) and quality-prioritized token-budget mixing (fill each
  * language's token budget best-documents-first).
  *
  * Scale notes (100 TB):
  *  - sampling is hash-threshold, not RNG: one narrow codegen'd scan, no
  *    shuffle, no state, reproducible across runs/engines/partitionings —
  *    re-running the pipeline selects the SAME corpus (the property that
  *    makes training runs comparable);
  *  - the token-budget mix is one shuffle keyed by language plus a running
  *    window — at web scale the per-language partitions are the natural
  *    skew concern, so [[tokenBudgetMixSharded]] budgets by (lang, shard):
  *    the exact per-language form is kept as the oracle-checkable
  *    reference semantics.
  */
object Sampling {

  /** 8-hex-digit md5 prefix of a key — a deterministic uniform draw.
    * Lowercase hex strings of equal length order lexicographically as
    * their numeric value, so `sampleKey < hexThreshold(rate)` keeps
    * ~rate of rows identically in any engine with md5 — no RNG, stable
    * under repartitioning. */
  def sampleKey(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8)

  /** Hex keep-threshold for a rate in [0,1]: floor(rate·16⁸) as 8-digit
    * lowercase hex. A rate ≥ 1 becomes "g", which compares greater than
    * every hex digit, keeping everything. */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, (rate * 4294967296L).toLong)}%08x"

  /** Deterministic per-language downsampling — the corpus-mixing
    * primitive (keep 50% of English, all of French, 10% of the rest).
    * Pure filter on a hashed key: no shuffle except the presentation
    * sort. */
  def stratifiedSample(documents: DataFrame, rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (lang, rate)) =>
        when(col("lang") === lang, lit(hexThreshold(rate))).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"),
        sampleKey(col("doc_id")).as("sample_key"))
      .filter(col("sample_key") < threshold)
      .orderBy(col("doc_id"))
  }

  /** Temperature-flattened language mix (t16): sampling rates derived
    * FROM the data so that kept counts are proportional to n_lang^α with
    * α = 1/2 — the standard multinomial-temperature rebalance LLM
    * pipelines apply so high-resource languages stop drowning the rest
    * (en at 44% of this corpus lands near 30% of the sample). Rates are
    * computed per language and applied with the same hash-threshold
    * filter as [[stratifiedSample]] — deterministic, RNG-free, stable
    * under repartitioning.
    *
    * Cross-engine arithmetic, step by step: α = 1/2 specifically because
    * IEEE `sqrt` is correctly rounded (identical bits on every engine —
    * a general `pow` is NOT and could flip a threshold comparison);
    * per-language weights quantize to integers (`floor(sqrt(n)·10⁶)`)
    * so the total weight is an order-free exact integer sum; the final
    * rate is one double division of two exact longs; and the rate
    * becomes an 8-hex-digit threshold string with the identical
    * hex/lpad/lower tree in the oracle.
    *
    * Scale: one tiny per-language aggregate (broadcast back over the
    * scan), then a pure filter — no corpus shuffle at all. */
  def temperatureMix(documents: DataFrame,
      targetDocs: Long = 250L): DataFrame = {
    val counts = documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_l"))
      .withColumn("sq_l",
        floor(sqrt(col("n_l").cast("double")) * 1000000).cast("long"))
    val tot = counts.agg(sum(col("sq_l")).as("tot"))
    val rates = counts.join(broadcast(tot))
      .withColumn("rate", least(lit(1.0),
        (lit(targetDocs) * col("sq_l")).cast("double") /
          (col("tot") * col("n_l")).cast("double")))
      .withColumn("threshold", when(col("rate") >= 1.0, lit("g"))
        .otherwise(lower(lpad(
          hex(floor(col("rate") * 4294967296.0).cast("long")), 8, "0"))))
      .select(col("lang"), col("threshold"))
    documents
      .select(col("doc_id"), col("lang"),
        sampleKey(col("doc_id")).as("sample_key"))
      .join(broadcast(rates), Seq("lang"))
      .filter(col("sample_key") < col("threshold"))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Quality-prioritized token-budget mix: per language, rank documents
    * by [[TextAnalysis.qualityScore]] (doc_id tie-break) and keep the
    * prefix whose running token total fits the budget — the "fill each
    * language's slice of the training mix with its best documents"
    * operator. One shuffle (window keyed by lang) over the already-narrow
    * quality projection. */
  def tokenBudgetMix(documents: DataFrame,
      budgetPerLang: Long = 5000L): DataFrame = {
    val quality = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents.select(col("doc_id"), col("lang"))
      .join(quality, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerLang)
      .select(col("lang"), col("doc_id"), col("n_tokens"), col("quality"),
        col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"))
  }

  /** Scale-safe token-budget mix: the production form of
    * [[tokenBudgetMix]]. The exact form's window partitions by language
    * alone, so at web scale the dominant language's whole quality-ranked
    * corpus streams through ONE running-sum task. Here each document is
    * hashed into one of `numShards` shards and the language budget is
    * split evenly across them: the window partitions by (lang, shard),
    * giving `numShards` parallel running sums per language.
    *
    * Semantics: quality ordering is exact WITHIN each shard; across
    * shards the budget split is even, which hash-uniform shard assignment
    * makes asymptotically fair (each shard sees an iid sample of the
    * language's quality distribution, so the per-shard quality cutoffs
    * converge as shards grow). Up to numShards·max_doc_tokens of budget
    * can go unused to prefix rounding — negligible at any real budget.
    * With `numShards = 1` this is bitwise [[tokenBudgetMix]] (modulo the
    * extra `shard` column). */
  def tokenBudgetMixSharded(documents: DataFrame,
      budgetPerLang: Long = 5000L, numShards: Int = 16): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val quality = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val perShard = budgetPerLang / numShards
    val w = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents.select(col("doc_id"), col("lang"),
        pmod(xxhash64(col("doc_id")), lit(numShards.toLong)).as("shard"))
      .join(quality, Seq("doc_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= perShard)
      .select(col("lang"), col("shard"), col("doc_id"), col("n_tokens"),
        col("quality"), col("cum_tokens"))
      .orderBy(col("lang"), col("shard"), col("cum_tokens"))
  }

  /** Per-source document cap — the "no domain dominates the corpus" rule
    * of web-scale pipelines: keep at most `cap` documents per source,
    * preferring longer documents (n_chars desc, doc_id tie-break).
    *
    * One window shuffle keyed by source. A mega-source is the skew case:
    * rank-then-filter still sorts that source's full partition, so at
    * 100 TB pre-filter each (source, shard) to the cap first — capping
    * shards at `cap` keeps every global-top-cap candidate (any doc
    * outside its shard's top-cap is outside the source's top-cap) —
    * then take the exact top-cap of the ≤ numShards·cap survivors. */
  def perSourceCap(documents: DataFrame, cap: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    documents
      .select(col("source"), col("doc_id"), col("n_chars"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= cap)
      .orderBy(col("source"), col("rk"))
  }

  /** Pack documents into fixed-token-budget training sequences — the last
    * step of training-set assembly: a reproducible corpus shuffle plus
    * packing into `seqTokens`-sized bins.
    *
    * The order is the md5 shuffle key ([[sampleKey]]) — a deterministic
    * "random" permutation, so reruns pack identically (comparable
    * training runs); doc_id breaks collisions. Documents hash into 16
    * shards (first hex digit of the same key) and each shard packs
    * independently with its own running token sum — 16 parallel running
    * sums instead of one global funnel (the same skew fix as
    * [[tokenBudgetMixSharded]]); at larger scale widen the shard prefix
    * (2 hex digits → 256 shards).
    *
    * A document lands in the sequence holding its FIRST token
    * (`seq_id = cum_before div seqTokens`): sequences absorb boundary
    * straddle rather than splitting documents, so per-sequence overflow
    * is bounded by one document — the concat-then-chunk contract of
    * training pipelines. */
  def packSequences(documents: DataFrame, seqTokens: Long = 512): DataFrame = {
    val key = sampleKey(col("doc_id"))
    val base = documents.select(col("doc_id"),
      substring(key, 1, 1).as("shard"), key.as("shuffle_key"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("shard"),
        expr(s"cum_before div $seqTokens").as("seq_id"),
        col("doc_id"), col("n_tokens"), col("cum_before"))
      .orderBy(col("shard"), col("cum_before"))
  }

  /** Deterministic weighted (importance) sampling: each document is kept
    * with probability proportional to its weight — here min(n_chars,
    * maxWeight)/maxWeight, the "prefer substantial documents" prior —
    * using the same RNG-free hash-threshold mechanism as
    * [[stratifiedSample]], but with a PER-ROW threshold derived from the
    * row's own weight. Repartition-stable, rerun-stable, and a pure
    * filter: no shuffle except the presentation sort.
    *
    * Cross-engine arithmetic: the threshold is `w·2³² div maxWeight` —
    * integer products ≤ n_chars·2³² ≪ 2⁶³ and a floor division, both
    * exact in any engine (a double divide-then-floor could land on the
    * wrong side of an integer boundary by one ulp). Full-weight rows
    * short-circuit to the always-keep sentinel "g" (lexically above any
    * hex digit), sidestepping the 9-hex-digit 2³² edge. */
  def weightedSample(documents: DataFrame,
      maxWeight: Long = 400L): DataFrame = {
    val w = least(col("n_chars"), lit(maxWeight))
    documents
      .select(col("doc_id"), col("lang"), col("n_chars"),
        w.as("weight"), sampleKey(col("doc_id")).as("sample_key"))
      .withColumn("threshold",
        when(col("weight") >= maxWeight, lit("g"))
          .otherwise(lower(lpad(hex(
            expr(s"weight * 4294967296 div $maxWeight")), 8, "0"))))
      .filter(col("sample_key") < col("threshold"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("weight"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/validation/test assignment by hash range —
    * the split every evaluation pipeline needs to be LEAKAGE-PROOF: a
    * document's split is a pure function of its id, so reruns,
    * backfills, and incremental appends can never migrate a test
    * document into training. Thresholds partition the hash space
    * (disjoint + exhaustive by construction); a pure projection, no
    * shuffle, no RNG. */
  def splitAssign(documents: DataFrame, trainRate: Double = 0.8,
      valRate: Double = 0.1): DataFrame = {
    require(trainRate > 0 && valRate > 0 && trainRate + valRate < 1.0,
      s"rates must leave test mass: train=$trainRate val=$valRate")
    val key = sampleKey(col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"),
        when(key < hexThreshold(trainRate), "train")
          .when(key < hexThreshold(trainRate + valRate), "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Contamination-aware split: [[splitAssign]] composed with
    * [[TextAnalysis.contaminationScores]] — benchmark documents get
    * their own label, and any training-side document sharing shingles
    * with the benchmark set is QUARANTINED instead of split, so eval
    * integrity survives the assignment step (the leakage t21 cannot
    * see: hash-disjointness does not imply content-disjointness).
    *
    * The quarantine join is a key equi-join against the contaminated
    * id set (overlap-proportional, usually tiny; no broadcast hint —
    * AQE decides); everything else is t21's pure projection. */
  def safeSplit(documents: DataFrame,
      benchPredicate: org.apache.spark.sql.Column,
      trainRate: Double = 0.8, valRate: Double = 0.1): DataFrame = {
    val contaminated = TextAnalysis
      .contaminationScores(documents, benchPredicate)
      .select(col("doc_id"), lit(true).as("contaminated"))
    val key = sampleKey(col("doc_id"))
    documents
      .select(col("doc_id"), col("lang"), benchPredicate.as("is_bench"),
        when(key < hexThreshold(trainRate), "train")
          .when(key < hexThreshold(trainRate + valRate), "val")
          .otherwise("test").as("base_split"))
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("is_bench"), "benchmark")
          .when(col("contaminated"), "quarantine")
          .otherwise(col("base_split")).as("split"))
      .orderBy(col("doc_id"))
  }

  /** Source-interleaved training order: rank documents WITHIN each
    * source by the deterministic shuffle key, then read in (rank,
    * source) order — position 1 of every source, then position 2, … —
    * so no source ever streams a long contiguous run into training
    * (the curriculum-stability property round-robin mixing buys).
    *
    * The per-source rank window partitions by source (parallel); the
    * global (rank, source) order is only materialized for the first
    * `take` positions via orderBy+limit — TakeOrderedAndProject:
    * per-partition top-N and a driver merge of N-row frames, never a
    * global sort. */
  def interleaveBySource(documents: DataFrame, take: Int = 60): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(sampleKey(col("doc_id")), col("doc_id"))
    documents
      .select(col("source"), col("doc_id"),
        row_number().over(w).cast("long").as("rk"))
      .orderBy(col("rk"), col("source"))
      .limit(take)
  }

  /** Exactly-N deterministic global sample: the N smallest shuffle
    * keys. Same reproducibility contract as [[stratifiedSample]] but
    * with an exact output size (rate-based sampling only hits N in
    * expectation). Plans as TakeOrderedAndProject — each partition
    * keeps its local top-N, the driver merges N-row frames; no global
    * sort, no funnel. */
  def exactSample(documents: DataFrame, n: Int = 100): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        sampleKey(col("doc_id")).as("sample_key"))
      .orderBy(col("sample_key"), col("doc_id"))
      .limit(n)

  /** t34: exactly-N-PER-STRATUM deterministic sample — the eval-set
    * builder's contract ([[stratifiedSample]] only hits each
    * stratum's rate in expectation; [[exactSample]] is exact but
    * global): the N smallest hash keys WITHIN each language. Rerun-
    * and repartition-stable (a pure function of the data SET), and
    * samples NEST (the N=10 sample is a prefix of the N=20 sample per
    * stratum). Unlike the rate-based [[stratifiedSample]], an APPEND
    * can displace a boundary member (a new doc with a smaller key
    * shifts ranks) — when append-invariance matters more than exact
    * size, t08 is the right tool.
    *
    * Plan shape: one rank window partitioned by stratum — parallel
    * across strata (the t22 argument); a pathologically hot stratum
    * pays its own sort, bounded by per-stratum data, and the
    * production variant for huge strata is the t23
    * TakeOrderedAndProject per stratum via a two-level (stratum,
    * shard) pre-rank. */
  def stratifiedExactN(documents: DataFrame, n: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("sample_key").asc, col("doc_id").asc)
    documents
      .select(col("lang"), col("doc_id"),
        sampleKey(col("doc_id")).as("sample_key"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .orderBy(col("lang"), col("rank"))
  }

  /** p06: the EVAL-SET build — p04's counterpart for the held-out
    * side: exactly `nPerLang` documents per language drawn ONLY from
    * the contamination-safe test slice ([[safeSplit]]: benchmark docs
    * out, benchmark-overlapping docs quarantined, hash-range split so
    * appends can't migrate a test doc to train), ranked by the
    * deterministic sample key ([[stratifiedExactN]]'s contract:
    * nests, rerun-stable). The output is the language-balanced eval
    * manifest an evaluation harness consumes, with every leakage gate
    * already applied and each stage's semantics the audited
    * single-operator query's.
    *
    * Plan shape: safeSplit's posting pass + pure-projection split,
    * then one rank window per stratum over the test-slice survivors —
    * strata in parallel, window input already filtered to the ~10%
    * test slice. */
  def evalSetBuild(documents: DataFrame,
      benchPredicate: org.apache.spark.sql.Column,
      nPerLang: Int = 10): DataFrame = {
    val testIds = safeSplit(documents, benchPredicate)
      .filter(col("split") === "test").select(col("doc_id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("sample_key").asc, col("doc_id").asc)
    documents.join(testIds, "doc_id")
      .select(col("lang"), col("doc_id"),
        sampleKey(col("doc_id")).as("sample_key"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= nPerLang)
      .orderBy(col("lang"), col("rank"))
  }

  /** p09: DSIR data SELECTION (Xie et al. 2023's selection stage on
    * top of t31's importance weights): from the non-target sources,
    * the `n` documents whose token distribution most resembles the
    * target domain — the highest log-likelihood-ratio docs, id
    * tie-break. This is the "pick pretraining data that looks like
    * the target" step; t31 computes the estimator, this materializes
    * the chosen manifest (DSIR's hashed-ngram sampling reduces to a
    * ranked cut when the selector is deterministic — the t23/t34
    * exactness stance).
    *
    * Plan shape: t31's audited shuffles + a TakeOrderedAndProject
    * top-n (per-partition top-n, driver merge of n rows) — no global
    * sort materializes. */
  def dsirSelect(documents: DataFrame, n: Int = 100): DataFrame =
    TextAnalysis.dsirWeights(documents)
      .filter(col("source") =!= "src0")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("mean_bits"))
      .orderBy(col("mean_bits").desc, col("doc_id"))
      .limit(n)

  /** p12: the PUBLISH manifest — the integrity artifact a pipeline
    * writes next to its sharded corpus export (the Dolma/OLMo-style
    * "data card" every reproducible training run starts from). Each
    * document lands in a shard by the first hex digit of its md5
    * shuffle key (the [[packSequences]] deterministic permutation, so
    * the export IS the training order) and each shard row attests:
    * document count, exact token sum, the shard's key range
    * (min/max shuffle key — adjacent shards must not overlap), first
    * and last document markers in shuffle order (`key:doc_id`
    * composite strings, so an 8-hex-digit key collision — ~40% likely
    * at 60k docs by birthday — still breaks ties deterministically),
    * and an ORDER-FREE content checksum: the exact integer sum of
    * each document's 60-bit md5(text) prefix. Any dropped, duplicated,
    * or altered document flips the checksum; any reordering doesn't —
    * order is attested by the marker columns, content by the sum, and
    * the split keeps the aggregate fully partial (map-side combinable),
    * where an order-SENSITIVE digest (md5-of-concatenation) would
    * force per-shard collect_list state.
    *
    * Overflow headroom: each digest < 2⁶⁰; the internal DECIMAL(38,0)
    * sum holds 10³⁸, so it is exact past 10²⁰ documents per shard —
    * far beyond the 100 TB posture (DuckDB mirrors with a HUGEINT
    * sum). conv() parses at most 15 hex digits, inside the
    * unsigned-64 range where Spark's conv is exact. The PUBLISHED
    * checksum is the sum rendered as a zero-padded fixed-width
    * 39-char decimal STRING, not a decimal column: string rendering
    * is byte-identical across engines and readers, where
    * decimal128's physical layout is canonicalized differently by
    * different Arrow/parquet paths (observed: the round-15 driver
    * hashed the identical decimal values unequally between its
    * DuckDB fetch and its parquet read — p12/p13 were the suite's
    * only decimal-emitting queries and its only hash failures).
    * Fixed width keeps the string ordering identical to the numeric
    * ordering, so the column still sorts/compares like the integer.
    *
    * Plan shape: ONE narrow scan computes key, token count, and digest
    * (all codegen scalar work; text never leaves the scan stage), then
    * ONE shard-keyed partial aggregate → 16 rows. Nothing else moves.
    * At larger scale widen the shard prefix (2 hex digits → 256
    * shards), exactly as [[packSequences]] documents. */
  /** p19: DOMAIN REWEIGHTING by multiplicative weights — DoReMi's
    * harness (Xie et al. 2023 "DoReMi: Optimizing Data Mixtures Speeds
    * Up Language Model Pretraining") in its deterministic, engine-
    * checkable form: domains with EXCESS LOSS get their mixture weight
    * multiplied up each round, then the weight vector renormalizes —
    * `rounds` synchronous updates of w ← normalize(w · (1 + η·excess)).
    * The published method's excess loss is a proxy-model/reference-
    * model loss gap; that column is PLUGGABLE — here it is a redundancy
    * proxy computable exactly from the corpus (mean-TTR deficit:
    * sources less lexically diverse than the per-source average carry
    * positive excess), so the optimizer loop itself — the part that is
    * a data-engine job — is oracle-checkable end to end. η = 1/2: the
    * update multiplier `1 + excess/2` is one exact halving and one add
    * (the linearized MW update — exp(η·excess) is libm and engine-
    * drifty, its first-order form is bit-stable and the standard MW
    * variant).
    *
    * Float discipline: per-source TTR and the mean-TTR reference are
    * divisions/folds of exact longs in SOURCE-ASC fixed order (the b03
    * fold contract); each round is one multiply-add per source and one
    * source-ASC fold for the normalizer — both engines build the same
    * doubles bit for bit through all `rounds` iterations.
    *
    * Plan shape: the corpus is touched ONCE (a (source, token) distinct
    * partial agg + per-source token counts); everything after is
    * |sources|-row model-artifact arithmetic — the k-medians loop
    * discipline, each round's frame anchored so the lazy plan stays
    * linear instead of doubling per iteration (the normalizer and the
    * next round both re-read it). At 100 TB this is one scan plus
    * K-row math. */
  def domainReweight(documents: DataFrame, rounds: Int = 4): DataFrame = {
    import graft.operators.Anchor.AnchorOps
    val toks = documents.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val perSource = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        count_distinct(col("tok")).as("n_distinct"))
      .withColumn("ttr", col("n_distinct").cast("double") /
        col("n_tokens").cast("double"))
    val ref = perSource.agg(
      (aggregate(sort_array(collect_list(struct(col("source"),
        col("ttr")))), lit(0.0), (acc, x) => acc + x.getField("ttr")) /
        count(lit(1)).cast("double")).as("mean_ttr"),
      count(lit(1)).as("n_sources"))
    var w = perSource.crossJoin(broadcast(ref))
      .select(col("source"), col("n_tokens"), col("ttr"),
        greatest(lit(0.0), col("mean_ttr") - col("ttr")).as("excess"),
        (lit(1.0) / col("n_sources").cast("double")).as("w"))
    for (_ <- 1 to rounds) {
      val u = w.withColumn("u",
        col("w") * (lit(1.0) + lit(0.5) * col("excess"))).anchored
      val s = u.agg(aggregate(sort_array(collect_list(struct(
        col("source"), col("u")))), lit(0.0),
        (acc, x) => acc + x.getField("u")).as("s"))
      w = u.crossJoin(broadcast(s))
        .select(col("source"), col("n_tokens"), col("ttr"),
          col("excess"), (col("u") / col("s")).as("w"))
    }
    w.select(col("source"), col("n_tokens"), col("ttr"), col("excess"),
        col("w").as("weight"))
      .orderBy(col("source"))
  }

  /** p20: the MIXTURE MANIFEST — [[domainReweight]]'s trained weight
    * vector COMPILED into the executable sampling pipeline and
    * reconciled: target tokens per source = B·w (Σw = 1), rate =
    * min(1, target/available), rate → the t08/t16 8-hex-digit
    * hash threshold, and the per-source keep counts/token mass the
    * threshold actually selects. This closes the DoReMi loop the way a
    * production pipeline does — an optimized mixture is only real once
    * it is a deterministic, re-runnable SELECTION of concrete
    * documents, and the manifest is the reviewable artifact proving
    * what the weights did (under-budget sources saturate at rate 1 and
    * report their deficit implicitly via tokens_kept < target).
    *
    * Float discipline: w is p19's bit-stable chain; target = one
    * multiply of the exact budget; rate = least(1, one division by an
    * exact long); the threshold literal floors rate·2³² — the SAME
    * expression tree both engines (the t16 contract), so the floor
    * cannot straddle; the keep decision is a STRING compare of md5
    * prefixes (no float at the cut line at all).
    *
    * Plan shape: p19's one corpus pass trains the weights (K-row
    * artifact); the manifest is ONE more narrow corpus scan joined to
    * the broadcast K-row rate frame + a source-keyed partial agg —
    * hash-threshold selection, no shuffle of the corpus, rerun-stable
    * and append-stable at any scale. */
  def mixtureManifest(documents: DataFrame,
      budgetTokens: Long = 12000L): DataFrame = {
    val rates = domainReweight(documents)
      .select(col("source"), col("n_tokens"), col("weight"),
        least(lit(1.0), (lit(budgetTokens.toDouble) * col("weight")) /
          col("n_tokens").cast("double")).as("rate"))
      .withColumn("threshold", when(col("rate") >= 1.0, lit("g"))
        .otherwise(lower(lpad(
          hex(floor(col("rate") * 4294967296.0).cast("long")), 8, "0"))))
    val docs = documents.select(col("source"),
      sampleKey(col("doc_id")).as("k"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
    docs.join(broadcast(rates), "source")
      .withColumn("keep", col("k") < col("threshold"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_docs_kept"),
        sum(when(col("keep"), col("ntok")).otherwise(0L))
          .as("tokens_kept"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("weight")).as("weight"),
        min(col("rate")).as("rate"),
        min(col("threshold")).as("threshold"))
      .orderBy(col("source"))
  }

  /** p16: the EPOCH / REPEAT PLAN under a token budget — the
    * data-constrained scheduling table (Muennighoff et al. 2023
    * "Scaling Data-Constrained Language Models": repeating a source up
    * to ~4 epochs is nearly as good as fresh data, returns decay fast
    * beyond that). Per source: exact unique-token count, the
    * temperature-α=½ mixture weight ([[temperatureMix]]'s quantized-
    * sqrt law — IEEE sqrt is correctly rounded, a general pow is not),
    * the budget's target token allocation, the integral epoch count the
    * cap allows, the tokens actually servable, the deficit the cap
    * refuses (reported, NOT silently reallocated — reallocation is
    * p03's budget job and hiding a deficit is how a mixture silently
    * drifts), and the repeated-token fraction.
    *
    * Cross-engine arithmetic: weights are order-free exact integer
    * sums (floor(sqrt(n)·10⁶)); the target is floor(B · (w/Σw)) with
    * the division FIRST — one IEEE divide then one multiply of an
    * exact small integer, the same expression tree in DuckDB, so the
    * floor can never straddle engines; epochs are pure integer
    * ceil-div; the only other float is the final repeat_frac divide.
    *
    * Scale: one narrow corpus scan → per-source token sums (broadcast
    * back over ≤ |sources| rows); everything else is model-scale. */
  def epochPlan(documents: DataFrame, budgetTokens: Long = 60000L,
      maxEpochs: Int = 4): DataFrame = {
    val counts = documents
      .groupBy(col("source"))
      .agg(sum(size(TextAnalysis.tokens(col("text"))).cast("long"))
        .as("n_tokens"))
      .withColumn("weight_fp",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000).cast("long"))
    val tot = counts.agg(sum(col("weight_fp")).as("tot"))
    counts.join(broadcast(tot))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) *
          (col("weight_fp").cast("double") / col("tot").cast("double")))
          .cast("long"))
      .withColumn("epochs",
        least(greatest(
          expr("(target_tokens + n_tokens - 1) div n_tokens"), lit(1L)),
          lit(maxEpochs.toLong)))
      .withColumn("served_tokens",
        least(col("target_tokens"), col("epochs") * col("n_tokens")))
      .withColumn("deficit", col("target_tokens") - col("served_tokens"))
      .withColumn("repeat_frac",
        when(col("served_tokens") > 0,
          (col("served_tokens") -
            least(col("served_tokens"), col("n_tokens"))).cast("double") /
            col("served_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .select(col("source"), col("n_tokens"), col("weight_fp"),
        col("target_tokens"), col("epochs"), col("served_tokens"),
        col("deficit"), col("repeat_frac"))
      .orderBy(col("source"))
  }

  /** Renders an exact integer checksum sum as the published
    * fixed-width decimal string (39 chars — one more than the
    * DECIMAL(38,0) accumulator can ever need, so no value truncates).
    * Shared by p12/p13 so the rendering law cannot drift; the DuckDB
    * twins carry the same `lpad(CAST(x AS VARCHAR), 39, '0')`. */
  private[operators] def checksumRender(sum: Column): Column =
    lpad(sum.cast("string"), 39, "0")

  /** The per-doc shard row behind [[shardManifest]] — shared with p13's
    * schedule export so shard key, token law, and checksum digest stay
    * one source of truth across every manifest the pipeline publishes. */
  private[operators] def shardBase(documents: DataFrame): DataFrame = {
    val key = sampleKey(col("doc_id"))
    documents.select(
      col("doc_id"),
      substring(key, 1, 1).as("shard"),
      key.as("shuffle_key"),
      concat(key, lit(":"),
        lpad(col("doc_id").cast("string"), 10, "0")).as("marker"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"),
      conv(substring(md5(col("text")), 1, 15), 16, 10)
        .cast("decimal(38,0)").as("content_digest"))
  }

  def shardManifest(documents: DataFrame): DataFrame =
    renderManifest(rawManifest(documents))

  /** The UNRENDERED manifest — every column either an exact integer
    * aggregate (count/sum, the checksum still DECIMAL(38,0)) or a
    * min/max, i.e. a fully MERGEABLE partial-aggregate state: two raw
    * manifests over disjoint batches merge to the raw manifest of
    * their union ([[mergeManifests]]), which is what lets a pipeline
    * maintain the manifest incrementally instead of rescanning the
    * corpus per publish. Publication always goes through
    * [[renderManifest]] (the decimal never leaves the engine). */
  private[operators] def rawManifest(documents: DataFrame): DataFrame =
    shardBase(documents).groupBy(col("shard")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("sum_tokens"),
      min(col("shuffle_key")).as("min_key"),
      max(col("shuffle_key")).as("max_key"),
      min(col("marker")).as("first_marker"),
      max(col("marker")).as("last_marker"),
      sum(col("content_digest")).as("checksum_acc"))

  /** Merge mergeable raw manifests ([[rawManifest]]) — counts/sums
    * add (the checksum is an order-free integer sum by construction),
    * key ranges and markers min/max. Associative and commutative, so
    * any batching of the corpus folds to the same manifest. */
  private[operators] def mergeManifests(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _).groupBy(col("shard")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("sum_tokens")).as("sum_tokens"),
      min(col("min_key")).as("min_key"),
      max(col("max_key")).as("max_key"),
      min(col("first_marker")).as("first_marker"),
      max(col("last_marker")).as("last_marker"),
      sum(col("checksum_acc")).as("checksum_acc"))

  /** Render a raw manifest for publication (fixed-width string
    * checksum, shard order). */
  private[operators] def renderManifest(raw: DataFrame): DataFrame =
    raw.select(col("shard"), col("n_docs"), col("sum_tokens"),
        col("min_key"), col("max_key"), col("first_marker"),
        col("last_marker"),
        checksumRender(col("checksum_acc")).as("content_checksum"))
      .orderBy(col("shard"))

  /** p17: INCREMENTAL MANIFEST MAINTENANCE — the mergeability law of
    * p12's manifest made the query: the corpus arrives as three
    * batches (doc_id mod 3), each batch is manifested INDEPENDENTLY
    * ([[rawManifest]] — one narrow scan per batch, exactly what a
    * per-ingest job sees), and the stored states merge
    * ([[mergeManifests]]: counts/sums/checksum add, ranges min/max) —
    * no batch is ever rescanned. The oracle is p12's whole-corpus SQL
    * VERBATIM: merged-incremental must equal recomputed-from-scratch
    * bit for bit, which is precisely the property (order-free exact
    * integer checksum, associative range bounds) the manifest's design
    * paid for. This is how the manifest stays current next to a
    * streaming ingest: each micro-batch contributes its raw rows, the
    * stored state folds them in at shard granularity (16 rows), and
    * publish renders — O(batch) per commit, never O(corpus)
    * (StreamingManifestSpec runs this loop through foreachBatch and
    * asserts bitwise parity with the batch form). */
  def incrementalManifest(documents: DataFrame): DataFrame = {
    val batches = (0 to 2).map(r =>
      rawManifest(documents.filter(col("doc_id") % 3 === r)))
    renderManifest(mergeManifests(batches: _*))
  }
}
