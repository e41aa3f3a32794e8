package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic checks of the text-analysis + dedup layers on a crafted
  * mini-corpus with KNOWN duplicate structure (the fixture-level behavior
  * is oracle-checked; these pin the semantics on readable inputs). */
class TextDedupSpec extends SparkSpec {

  private lazy val corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
      (3L, "a quick brown fox jumps over the lazy dog near the river bank today"), // near dup of 1
      (4L, "completely different content about spark query engines and shuffles"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
  }

  test("tokenStats counts whitespace and distinct tokens") {
    val r = TextAnalysis.tokenStats(corpus).filter("doc_id = 1").head()
    assert(r.getAs[Long]("n_ws_tokens") == 13)
    // 'the' appears 3x -> 11 distinct
    assert(r.getAs[Long]("n_distinct_words") == 11)
  }

  test("languageId picks en for English-stopword text") {
    val r = TextAnalysis.languageId(corpus.withColumn("lang", lit("en")))
      .filter("doc_id = 1").head()
    assert(r.getAs[String]("predicted_lang") == "en")
    assert(r.getAs[Long]("score_en") > 0)
  }

  test("exactDedup collapses byte-identical docs, keeps lowest id") {
    val out = Dedup.exactDedup(corpus).collect()
    assert(out.length == 4) // 1&2 collapse
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("kept_doc_id") == 1L)
  }

  test("normalizedDedup collapses NFC/NFD and spacing variants") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta"), (1L, "gamma,delta"))
      .toDF("doc_id", "text")
    val out = Dedup.normalizedDedup(docs).collect()
    // 2 content groups from 6 raw docs: the three injected variants of
    // each doc (NFC glued / NFD spaced / double-spaced) share one
    // canonical digest but carry 3 distinct raw digests each — what
    // byte-level dedup (d01) would have kept as separate documents
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_copies") == 3)
      assert(r.getAs[Long]("n_raw_variants") == 3)
    }
    assert(out.map(_.getAs[Long]("kept_doc_id")).toSeq == Seq(0L, 1L))
  }

  test("contaminationReport: per-benchmark leak fraction and breadth") {
    import spark.implicits._
    // doc 0 is the benchmark item (0 % 100 == 0); its first 3-gram
    // appears verbatim in train docs 1 and 2, its tail nowhere
    val docs = Seq(
      (0L, "alpha beta gamma unique1 unique2 unique3"),
      (1L, "alpha beta gamma other words here"),
      (2L, "prefix alpha beta gamma suffix tokens"),
      (3L, "completely unrelated training content")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationReport(docs,
      col("doc_id") % 100 === 0).collect()
    assert(out.length == 1)
    val r = out.head
    // doc 0 has 4 distinct 3-gram shingles; only 'alpha beta gamma'
    // leaks; it appears in 2 distinct train docs
    assert(r.getAs[Long]("n_bench_shingles") == 4L)
    assert(r.getAs[Long]("n_leaked_shingles") == 1L)
    assert(r.getAs[Double]("leak_frac") == 0.25)
    assert(r.getAs[Long]("n_train_docs") == 2L)
  }

  test("ppjoinPairs: prefix filtering is COMPLETE — equals d02 uncapped") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val full = rows(Dedup.jaccardPairs(docs, maxDocFreq = None))
    val pp = rows(Dedup.ppjoinPairs(docs))
    assert(pp == full, "prefix filtering missed or invented a pair")
    assert(full.nonEmpty, "fixture has no near-dup pairs — vacuous test")
  }

  test("ppjoinPairs: boilerplate-heavy corpus, still exact") {
    import spark.implicits._
    // every doc shares an 8-token boilerplate header (a hot shingle d02's
    // cap would drop); the pairs that matter differ in their tails
    val header = "standard license header all rights reserved by corp"
    val docs = Seq(
      (0L, s"$header alpha beta gamma delta epsilon"),
      (1L, s"$header alpha beta gamma delta zeta"),
      (2L, s"$header completely different tail tokens here"),
      (3L, s"$header another unrelated ending entirely now")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val full = rows(Dedup.jaccardPairs(docs, maxDocFreq = None))
    assert(rows(Dedup.ppjoinPairs(docs)) == full)
    // the shared header makes EVERY pair a candidate under plain
    // inverted-index joining; 0&1 genuinely exceed the bar
    assert(full.exists { case (a, b, _) => a == 0L && b == 1L })
  }

  test("fuzzyPairs: injected typos found at dist<=1, unrelated blocked out") {
    import spark.implicits._
    val docs = Seq((0L, "alpha document body text here"),
      (1L, "totally different content x")).toDF("doc_id", "text")
    val out = Dedup.fuzzyPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // each doc pairs with its own typo'd copy only; the two docs start
    // with different letters so they never share a block
    assert(out == Set((0L, 1000000L, 1L), (1L, 1000001L, 1L)))
  }

  test("scriptProfile classes sum to the token count") {
    import spark.implicits._
    val docs = Seq((0L, "one 1"), (1L, "two 2"), (2L, "three 3"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_tokens") ==
        r.getAs[Long]("n_han") + r.getAs[Long]("n_word") +
          r.getAs[Long]("n_num") + r.getAs[Long]("n_other"))
    }
    // doc 0 gets the Han suffix: " Héllo, 漢字!" -> 2 han tokens
    val d0 = out.find(_.getLong(0) == 0L).get
    assert(d0.getAs[Long]("n_han") == 2L)
    // doc 1 gets " déjà vu 2026" -> a num token and no han
    val d1 = out.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_num") == 2L && d1.getAs[Long]("n_han") == 0L)
  }

  test("jaccardPairs finds exact+near dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical -> J=1
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("identical docs have identical minhash signatures and all bands agree") {
    val sigs = Dedup.minhashSignatures(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L).split('|').length == 12)
    val cands = Dedup.lshCandidates(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(cands.exists(c => c._1 == 1L && c._2 == 2L && c._3 == 4L))
  }

  test("simhash: identical docs equal; near-dups closer than unrelated") {
    val h = Dedup.simhash(corpus).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(h(1L) == h(2L))
    assert(h.values.forall(_.length == 64))
    assert(hamming(h(1L), h(3L)) < hamming(h(1L), h(4L)))
  }

  test("embeddingNearDups finds only same-bucket high-cosine pairs") {
    import spark.implicits._
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(0.99f, 0.1f, 0.0f)), // ~same direction as 1
      (3L, 0, Array(0.0f, 1.0f, 0.0f)), // orthogonal to 1
      (4L, 1, Array(1.0f, 0.0f, 0.0f)) // same direction, other bucket
    ).toDF("vec_id", "label", "embedding")
    val pairs = Dedup.embeddingNearDups(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticDedup drops later near-dups inside trained clusters only") {
    // on the real fixture: recompute the keeper rule brute-force from
    // the SAME trained assignment and check d15 agrees row for row
    ModelArtifacts.clear()
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Dedup.semanticDedup(emb).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val cluster = rows.map { case (id, _) => id -> out(id)._1 }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = rows.toMap
    rows.foreach { case (id, v) =>
      val expectKept = !rows.exists { case (other, _) =>
        other < id && cluster(other) == cluster(id) &&
          cos(byId(other), v) >= 0.35
      }
      assert(out(id)._2 == expectKept, s"vec $id keep flag mismatch")
    }
    // the rule bites: some vector must actually be dropped, most kept
    val kept = out.values.count(_._2)
    assert(kept < out.size && kept > out.size / 2)
  }

  test("dedupClusters on an empty pair set returns empty without looping") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("vec_id_a", "vec_id_b")
    assert(Dedup.dedupClusters(empty).count() == 0)
  }

  test("heavy-hitter sketch equals exact counts in the no-eviction regime") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val sketch = TextAnalysis.heavyHitterBigrams(docs, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs
      .select(explode(
        graft.functions.TextFns.wordShingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 5)
      .orderBy(col("n").desc, col("bigram").asc)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sketch.nonEmpty && sketch == exact)
  }

  test("dedupClusters closes transitive chains into one canonical cluster") {
    import spark.implicits._
    // 4-3, 3-2, 2-1 is a 3-hop chain whose min label must propagate end
    // to end (multiple propagation rounds); 10-11 is an independent pair
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("vec_id_a", "vec_id_b")
    val rows = Dedup.dedupClusters(pairs).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    assert(rows.count(_.getAs[Boolean]("is_canonical")) == 2)
  }

  test("label propagation converges in diameter+1 rounds on a path graph") {
    import spark.implicits._
    // worst-case geometry for min-label propagation: a 20-edge path
    // 0-1-...-20 (diameter 20). The min label travels ONE hop per round,
    // so node k adopts label 0 in exactly round k: convergence takes
    // diameter rounds, and the `changed` counter needs one more quiet
    // round to read zero — the driver-round = diameter relationship the
    // scaladoc promises.
    val pairs = (0L until 20L).map(i => (i, i + 1))
      .toDF("vec_id_a", "vec_id_b")
    // a budget of exactly diameter+1 rounds suffices...
    val rows = Dedup.dedupClusters(pairs, maxIters = 21).collect()
    assert(rows.length == 21)
    assert(rows.forall(_.getAs[Long]("cluster_id") == 0L))
    assert(rows.count(_.getAs[Boolean]("is_canonical")) == 1)
    // ...and the bound is TIGHT: half the diameter cannot close the
    // chain, and the loop fails loudly instead of returning the
    // partially-propagated labels it holds at that point
    intercept[IllegalArgumentException] {
      Dedup.dedupClusters(pairs, maxIters = 10)
    }
  }

  test("starContraction (d20): same fixed point as dedupClusters, " +
      "empty-safe, and LOGARITHMIC rounds on the path graph") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("vec_id_a", "vec_id_b")
    assert(Dedup.starContraction(empty).count() == 0)
    val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
      .toDF("vec_id_a", "vec_id_b")
    val rows = Dedup.starContraction(pairs).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    assert(rows.count(_.getAs[Boolean]("is_canonical")) == 2)
    // the reason d20 exists: the 20-edge path needs 21 propagation
    // rounds in dedupClusters (asserted above) but converges within a
    // LOG-sized budget under star contraction — depth roughly halves
    // per large/small-star pass
    val path = (0L until 20L).map(i => (i, i + 1))
      .toDF("vec_id_a", "vec_id_b")
    val star = Dedup.starContraction(path, maxIters = 8).collect()
    assert(star.length == 21)
    assert(star.forall(_.getAs[Long]("cluster_id") == 0L))
    assert(star.count(_.getAs[Boolean]("is_canonical")) == 1)
  }

  test("starContraction equals dedupClusters on the fixture near-dup " +
      "graph (two algorithms, one fixed point)") {
    val pairs = Dedup.embeddingNearDups(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
    val a = Dedup.dedupClusters(pairs).collect().toSeq
    val b = Dedup.starContraction(pairs).collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("canonicalUrl: each rule verified on a handcrafted URL") {
    import spark.implicits._
    val cases = Seq(
      // host case + www + trailing slash (path case preserved)
      ("https://WWW.Example.COM/A/b/", "example.com/A/b"),
      // utm params dropped, survivors sorted, fragment dropped
      ("http://example.com/A/b?utm_source=x&b=2&a=1#frag",
        "example.com/A/b?a=1&b=2"),
      // all params tracking -> no '?' at all
      ("https://example.com/p?utm_source=x&utm_medium=y", "example.com/p"),
      // root path collapses to bare host; scheme dropped (http==https)
      ("https://example.com/", "example.com"),
      ("http://example.com", "example.com"),
      // www stripped only as a LEADING label
      ("https://notwww.example.com/x", "notwww.example.com/x"))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), Dedup.canonicalUrl(col("url")).as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, expected) =>
      assert(out(u) == expected, s"canon($u) = ${out(u)}") }
    val dom = Seq("https://blog.news.example.org/x")
      .toDF("url")
      .select(Dedup.registeredDomain(col("url"))).head().getString(0)
    assert(dom == "example.org")
  }

  test("registeredDomain: PSL-lite multi-label suffixes register at " +
      "the third label") {
    import spark.implicits._
    val cases = Seq(
      // co.uk sites must NOT merge into 'co.uk'
      ("https://a.co.uk/x", "a.co.uk"),
      ("https://b.co.uk/y", "b.co.uk"),
      ("https://WWW.Blog.Example.CO.UK/x", "example.co.uk"),
      ("https://shop.something.com.au/", "something.com.au"),
      ("http://news.media.co.jp/a", "media.co.jp"),
      // ordinary gTLDs stay last-two-labels
      ("https://deep.sub.example.com/x", "example.com"),
      ("https://example.org", "example.org"),
      // 'co.uk'-LOOKALIKE label inside an ordinary domain: no PSL hit
      ("https://co.uk.example.com/x", "example.com"))
    val out = cases.map(_._1).toDF("url")
      .select(col("url"), Dedup.registeredDomain(col("url")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) =>
      assert(out(u) == want, s"domain($u) = ${out(u)}, want $want") }
  }

  test("urlDedup: 5-block collision structure, MIN keeper, flags") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.urlDedup(docs).collect()
    assert(out.length == docs.count())
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // variants 0+1 and 2+3 of each complete 5-block canonicalize
    // together with the smaller id kept; variant 4 is its own subdomain
    val maxId = byId.keys.max
    for (g <- 0L to (maxId / 5 - 1)) {
      val b = (0 to 4).map(i => byId(g * 5 + i))
      assert(b(0).getAs[String]("canon_url") ==
        b(1).getAs[String]("canon_url"))
      assert(b(2).getAs[String]("canon_url") ==
        b(3).getAs[String]("canon_url"))
      assert(b(0).getAs[String]("canon_url") !=
        b(2).getAs[String]("canon_url"))
      assert(b(4).getAs[String]("canon_url") !=
        b(0).getAs[String]("canon_url"))
      assert(b(0).getAs[Boolean]("is_kept") &&
        !b(1).getAs[Boolean]("is_kept"))
      assert(b(1).getAs[Long]("keep_doc_id") == g * 5)
      assert(b(0).getAs[Long]("n_dups") == 2L)
      // the registered domain strips the blog. subdomain
      assert(b(4).getAs[String]("domain") ==
        b(0).getAs[String]("domain"))
    }
  }

  test("Anchor: d13 loop green under a RELIABLE checkpoint dir too") {
    import spark.implicits._
    // Anchor.cut switches from executor-resident localCheckpoint to
    // reliable checkpoint() when a dir is configured — the cluster
    // posture, where executor loss must not invalidate loop lineage.
    // Same chain fixture as the transitive-closure test, same answer.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L), (10L, 11L))
        .toDF("vec_id_a", "vec_id_b")
      val byId = Dedup.dedupClusters(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L))
    } finally {
      // Option(null) → None: cleanly restores the localCheckpoint path
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("Anchor.Loop releases superseded reliable checkpoints " +
      "(PeriodicCheckpointer discipline)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-loop")
    spark.sparkContext.setCheckpointDir(dir.toString)
    def rddDirs: Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .map(_.toString).toSeq
    }
    try {
      // d13's loop (chain of 4 → 4 rounds): edges + initial labels +
      // 4 round anchors = 6 cuts, but only the FINAL round's anchor may
      // survive — without cleanup a 50-round propagation would pile 50
      // full materializations into the fault-tolerant store.
      val pairs = Seq((4L, 3L), (3L, 2L), (2L, 1L))
        .toDF("vec_id_a", "vec_id_b")
      val out = Dedup.dedupClusters(pairs)
      assert(out.collect().length == 4)
      assert(rddDirs.size == 1,
        s"expected ONLY the final loop anchor on disk, got: $rddDirs")
      // the surviving anchor is still readable (release never touches it)
      assert(out.collect().map(_.getLong(1)).forall(_ == 1L))
      // close() releases the final anchor too, for loops whose result
      // is driver-collected (t38 BPE)
      val loop = new Anchor.Loop
      loop.cut(spark.range(5).toDF())
      loop.cut(spark.range(6).toDF())
      loop.close()
      assert(rddDirs.size == 1, s"Loop.close left files: $rddDirs")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
    }
  }
}

/** PII redaction + benchmark decontamination semantics. */
class PiiDecontamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("redactPii replaces emails and phones, counts each") {
    import spark.implicits._
    val df = Seq((1L, "write to alice.smith@corp.example.org or call " +
      "+44-123-4567, backup bob@ex.io")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df).head()
    assert(r.getAs[Long]("n_emails") == 2)
    assert(r.getAs[Long]("n_phones") == 1)
    val clean = r.getAs[String]("clean_text")
    assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>"))
    assert(!clean.contains("@") && !clean.contains("4567"))
  }

  test("contaminationScores flags docs sharing benchmark n-grams") {
    import spark.implicits._
    val docs = Seq(
      (100L, "the secret benchmark phrase appears here today"),
      (1L, "training doc with the secret benchmark phrase appears inside"),
      (2L, "completely unrelated training content about engines"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.contaminationScores(docs,
      col("doc_id") % 100 === 0)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("contamination")).toMap
    assert(out.contains(1L) && out(1L) > 0.3)
    assert(!out.contains(2L)) // no shared 3-grams -> not reported
    assert(!out.contains(100L)) // benchmark docs are not scored
  }
}

/** Incremental dedup against a digest index. */
class IncrementalDedupSpec extends graft.SparkSpec {
  test("new batch dedupes against the corpus index without rescanning it") {
    import spark.implicits._
    val corpus = Seq((1L, "known document alpha"), (2L, "known document beta"))
      .toDF("doc_id", "text")
    // bootstrap the index from the existing corpus
    val index = Dedup.exactDedup(corpus)
      .select($"content_md5", $"kept_doc_id".as("doc_id"))

    val batch = Seq(
      (10L, "known document alpha"), // dup of corpus -> rejected
      (11L, "fresh document gamma"), // new -> accepted
      (12L, "fresh document gamma"), // dup within batch -> rejected
      (13L, "fresh document delta")) // new -> accepted
      .toDF("doc_id", "text")

    val (accepted, additions) = Dedup.incrementalExactDedup(batch, index)
    assert(accepted.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(11L, 13L))
    assert(additions.count() == 2)

    // second increment against the grown index: nothing new left
    val grown = index.unionByName(additions)
    val (accepted2, _) = Dedup.incrementalExactDedup(batch, grown)
    assert(accepted2.count() == 0)
  }
}

/** Posting-list frequency cap (the boilerplate guard for web-scale corpora). */
/** p15: the source×source near-dup overlap matrix. */
class SourceOverlapSpec extends graft.SparkSpec {
  test("sourceOverlapMatrix: cross-source copies land in the right " +
      "cells; the diagonal counts the involved-doc union; fractions " +
      "read off source sizes") {
    import spark.implicits._
    val copyA = "tiger river dances over bright stones daily"
    val copyB = "silver harbor boats drift past sleepy lighthouse keepers"
    val docs = Seq(
      (1L, "quiet mountain breeze carries long winter tales", "s1"),
      (2L, "fresh valley morning brings calm golden light", "s1"),
      (3L, copyA, "s1"),
      (4L, copyA, "s2"), // s1↔s2 and s2↔s3 and s1↔s3 via the trio
      (5L, "young foxes chase autumn leaves across empty fields", "s2"),
      (6L, copyA, "s3"),
      (7L, copyB, "s3"),
      (8L, copyB, "s3")  // intra-s3 pair
    ).toDF("doc_id", "text", "source")
    val m = Dedup.sourceOverlapMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(m.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3"),
      ("s3", "s3")))
    assert(m(("s1", "s2")) == ((1L, 1L, 1L, 3L, 2L, 1.0 / 3.0, 0.5)))
    assert(m(("s1", "s3")) == ((1L, 1L, 1L, 3L, 3L, 1.0 / 3.0, 1.0 / 3.0)))
    assert(m(("s2", "s3")) == ((1L, 1L, 1L, 2L, 3L, 0.5, 1.0 / 3.0)))
    // diagonal: pair (7,8) involves {7,8} on BOTH sides of source s3
    assert(m(("s3", "s3")) == ((1L, 2L, 2L, 3L, 3L, 2.0 / 3.0, 2.0 / 3.0)))
  }

  test("sourceOverlapMatrix: the d11 bucket cap drops over-dense " +
      "buckets and only those") {
    import spark.implicits._
    val copyA = "tiger river dances over bright stones daily"
    val copyB = "silver harbor boats drift past sleepy lighthouse keepers"
    val docs = Seq(
      (3L, copyA, "s1"), (4L, copyA, "s2"), (6L, copyA, "s3"),
      (7L, copyB, "s3"), (8L, copyB, "s3")
    ).toDF("doc_id", "text", "source")
    // cap 2: copyA's 3-doc buckets dropped, copyB's 2-doc buckets kept
    val capped = Dedup.sourceOverlapMatrix(docs, maxBucket = Some(2))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(capped == Map(("s3", "s3") -> 1L))
    // cap 1: everything shared is over-cap — empty matrix
    assert(Dedup.sourceOverlapMatrix(docs, maxBucket = Some(1))
      .count() == 0L)
    // exact: all 3 trio pairs + the intra pair
    val exact = Dedup.sourceOverlapMatrix(docs, maxBucket = None)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head().getLong(0)
    assert(exact == 4L)
  }
}

class PostingCapSpec extends graft.SparkSpec {
  test("maxDocFreq drops shingles shared by more docs than the cap") {
    import spark.implicits._
    // "common header line x" appears in ALL 4 docs; unique tails don't
    val docs = (1L to 4L).map(i =>
      (i, s"common header line x unique tail number $i")).toDF("doc_id", "text")
    val uncapped = Dedup.shinglePostings(docs, 3, maxDocFreq = None)
    val capped = Dedup.shinglePostings(docs, 3, maxDocFreq = Some(3))
    val droppedShingles = uncapped.select("shingle").distinct().count() -
      capped.select("shingle").distinct().count()
    assert(droppedShingles > 0)
    // every surviving shingle appears in <= 3 docs
    val maxDf = capped.groupBy("shingle").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxDf <= 3)
    // per-doc unique shingles survive
    assert(capped.filter("shingle LIKE '%number 1'").count() == 1)
  }

  test("the DEFAULT maxDocFreq is finite and caps hot postings") {
    import spark.implicits._
    val n = Dedup.DefaultMaxDocFreq + 50
    // every doc shares the 3-token boilerplate head; tails are unique
    val docs = (1L to n.toLong).map(i =>
      (i, s"shared boilerplate header unique tail $i")).toDF("doc_id", "text")
    val post = Dedup.shinglePostings(docs, 3) // default arguments
    assert(post.filter("shingle = 'shared boilerplate header'").count() == 0)
    val maxDf = post.groupBy("shingle").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxDf <= Dedup.DefaultMaxDocFreq)
    // exact mode must keep the hot shingle for all n docs
    assert(Dedup.shinglePostings(docs, 3, maxDocFreq = None)
      .filter("shingle = 'shared boilerplate header'").count() == n)
  }

  test("capped containment drops hot-shingle-only pairs, keeps rare links") {
    import spark.implicits._
    // every doc = ["hot boiler plate", "boiler plate distinctI"]: ONE
    // hot shingle linking all docs (df=10 after containmentPairs
    // doubles the corpus with identical sub-200-char excerpts) plus one
    // rare shingle linking only the doc to its own excerpt copy
    val docs = (1L to 5L).map(i =>
      (i, s"hot boiler plate distinct$i")).toDF("doc_id", "text")
    def keys(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r =>
        (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val uncapped = Dedup.containmentPairs(docs, threshold = 0.4,
      maxDocFreq = None)
    val capped = Dedup.containmentPairs(docs, threshold = 0.4,
      maxDocFreq = Some(4))
    // cap-off: the hot shingle alone links every cross-doc pair at
    // containment 1/2 >= 0.4
    assert(keys(uncapped).contains((1L, 2L)))
    // cap-on (df 10 > 4): the hot shingle is gone, so pairs linked by
    // NOTHING ELSE vanish; each doc keeps exactly its excerpt pair,
    // scored over the CAPPED denominator (1 surviving shingle -> 1.0)
    val cappedRows = capped.collect().map(r =>
      ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(cappedRows.keySet ==
      (1L to 5L).flatMap(i =>
        Seq((i, i + 1000000L), (i + 1000000L, i))).toSet)
    assert(cappedRows.values.forall(_ == 1.0))
    // the cap only ever REMOVES link evidence here: surviving pairs are
    // a strict subset of the exact-mode pairs
    assert(cappedRows.keySet.subsetOf(keys(uncapped)))
    assert(cappedRows.size < keys(uncapped).size)
  }
}

/** Gopher-style repetition statistics (t07). */
class RepetitionStatsSpec extends graft.SparkSpec {
  test("run lengths, top-token and top-bigram shares on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b"),
      (2L, "one two three four"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    val r1 = got(1L) // "a a a b": run of 3 a's, bigram "a a" twice
    assert(r1.getAs[Long]("n_tokens") == 4)
    assert(r1.getAs[Long]("top_token_n") == 3)
    assert(r1.getAs[Double]("top_token_frac") == 0.75)
    assert(r1.getAs[Long]("max_run") == 3)
    assert(r1.getAs[Long]("top_bigram_n") == 2)
    assert(r1.getAs[Double]("top_bigram_frac") == 2.0 / 3.0)
    assert(r1.getAs[Boolean]("flag_repetitive"))

    val r2 = got(2L) // fully diverse: nothing repeats, not flagged
    assert(r2.getAs[Long]("top_token_n") == 1)
    assert(r2.getAs[Long]("max_run") == 1)
    assert(r2.getAs[Long]("top_bigram_n") == 1)
    assert(!r2.getAs[Boolean]("flag_repetitive"))

    val r3 = got(3L) // single token: no bigrams, trivially 100% one token
    assert(r3.getAs[Long]("n_tokens") == 1)
    assert(r3.getAs[Any]("top_bigram_n") == null)
    assert(r3.getAs[Any]("top_bigram_frac") == null)
    assert(r3.getAs[Boolean]("flag_repetitive"))
  }

  test("removeDuplicateSpans (d19): owner keeps, others excise; " +
      "overlapping windows union; short docs untouched") {
    import spark.implicits._
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Seq(
      (0L, "a b c d e f g h"), // owns every shared fingerprint
      (1L, "x y a b c d e z w"), // one shared window at start 2
      (2L, "a b c d e"), // the whole doc IS the shared span
      (3L, "p q r s"), // < window tokens: untouched by contract
      (4L, "m a b c d e f n") // TWO overlapping shared windows
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def row(id: Long) = (out(id).getAs[Long]("n_tokens"),
      out(id).getAs[Long]("n_dup_windows"),
      out(id).getAs[Long]("n_removed"),
      out(id).getAs[String]("kept_md5"))
    // owner: nothing removed, text bit-identical
    assert(row(0L) == ((8L, 0L, 0L, md5("a b c d e f g h"))))
    // one 5-token span excised from the middle
    assert(row(1L) == ((9L, 1L, 5L, md5("x y z w"))))
    // everything removed -> kept text is '' (the t36 empty edge)
    assert(row(2L) == ((5L, 1L, 5L, md5(""))))
    // short doc never enters the posting table
    assert(row(3L) == ((4L, 0L, 0L, md5("p q r s"))))
    // overlapping flagged windows union their coverage (6 positions)
    assert(row(4L) == ((8L, 2L, 6L, md5("m n"))))
  }

  test("domainBoilerplate (t44): in-domain df>=2 lines flagged; " +
      "hand-computed single-domain profile") {
    import spark.implicits._
    // docs 0..7 share registered domain example0.com (all five URL
    // variants); each text is exactly SIX distinct tokens, so each doc
    // renders ONE unique content line — only the injected extras
    // (shared by doc_id % 4) repeat within the domain
    val docs = (0L until 8L).map(i =>
      (i, (0 until 6).map(j => s"tok${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.domainBoilerplate(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "example0.com")
    assert(r.getAs[Long]("n_docs") == 8L)
    // 8 content lines + 8 extras observed; 8 + 4 distinct
    assert(r.getAs[Long]("n_line_occurrences") == 16L)
    assert(r.getAs[Long]("n_distinct_lines") == 12L)
    // the 4 extras each appear in 2 docs -> boilerplate
    assert(r.getAs[Long]("n_boilerplate_lines") == 4L)
    assert(r.getAs[Long]("n_boilerplate_occurrences") == 8L)
    assert(r.getAs[Double]("boilerplate_frac") == 0.5)
  }

  test("incrementalCorpusBuild: every stage fires on a crafted batch " +
      "(p10) — URL drop, digest reject, bench, retroactive retraction") {
    import spark.implicits._
    val t1 = "tiger river dances over bright stones daily"
    val t14 = "silver harbor boats drift past sleepy lighthouse keepers"
    val docs = Seq(
      // id 0: DELTA (%3=0) + BENCH (%10=0); same canon URL as base id 1
      // (variants 0+1) -> URL-dropped, but its text (= id 1's) still
      // enters the RAW bench reference and must retract base doc 1
      (0L, t1, "en"),
      (1L, t1, "en"), // base; %7=1 so a re-keyed copy 1000001 arrives too
      (2L, "quiet mountain breeze carries long winter tales", "en"),
      (3L, "fresh valley morning brings calm golden light", "en"),
      // ^ delta; canon(3)=canon(2) (variants 2+3) -> URL-dropped
      (10L, "ancient library shelves hold dusty forgotten pages", "en"),
      // ^ base BENCH (%10=0): reference content, never in the pool
      (14L, t14, "en"), // base train doc...
      (24L, "young foxes chase autumn leaves across empty fields", "en"),
      // ^ fresh delta train doc (variant 4 canon: no base sibling)
      (30L, t14, "en")
      // ^ delta BENCH re-publishing doc 14's content -> 14 RETRACTED
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.incrementalCorpusBuild(docs).collect()
    val byId = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_delta")).toMap
    // survivors: base doc 2 and fresh delta doc 24 — nothing else.
    // 0/3 die at the URL stage, 1000001 at the digest index, 10/30 are
    // bench, 1 and 14 are retracted by newly arrived bench content.
    assert(byId == Map(2L -> false, 24L -> true), s"got: $byId")
    val n = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(n(2L) == 7L && n(24L) == 8L)
  }

  test("fixture doc ids stay below the smallest re-key offset — " +
      "p10's +1M and m06/m07's +3M/+6M/+9M re-keyed id spaces rely on " +
      "disjointness from real ids") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val mx = graft.Tables.documents(spark, s"/root/testdata/$sf")
        .agg(max(col("doc_id"))).head.getLong(0)
      assert(mx < 1000000L, s"$sf max doc_id $mx collides with re-keys")
    }
  }

  test("pretrainCorpusBuild: every stage's contract visible in the output") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.pretrainCorpusBuild(docs).collect()
    assert(out.nonEmpty)
    val ids = out.map(_.getAs[Long]("doc_id"))
    // dedup: the doubled copies (+1000000) never survive — the original
    // (lower id) always wins the digest group
    assert(ids.forall(_ < 1000000L))
    assert(ids.distinct.length == ids.length)
    // decontamination: no benchmark doc, and no doc sharing a 3-gram
    // with the benchmark set
    assert(ids.forall(_ % 100 != 0))
    val contaminated = TextAnalysis.contaminationScores(docs,
      col("doc_id") % 100 === 0).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(!contaminated(_)))
    // quality gate + budget: scores clear the bar; per-lang cumulative
    // tokens are monotone in the (quality desc, id) order and capped
    assert(out.forall(_.getAs[Double]("quality") >= 0.5))
    for ((_, rows) <- out.groupBy(_.getAs[String]("lang"))) {
      val sorted = rows.sortBy(r => (-r.getAs[Double]("quality"),
        r.getAs[Long]("doc_id")))
      val cums = sorted.map(_.getAs[Long]("cum_tokens"))
      assert(cums.forall(_ <= 3000L))
      assert(cums.sliding(2).forall {
        case Array(a, b) => a < b
        case _ => true
      })
      // cum_tokens really is the running sum of n_tokens in rank order
      val expect = sorted.map(_.getAs[Long]("n_tokens"))
        .scanLeft(0L)(_ + _).tail
      assert(cums.toSeq == expect.toSeq)
    }
  }

  test("repetitionProfile: dup n-gram coverage rises with literal repeats") {
    import spark.implicits._
    val docs = Seq(
      // "a b a b a b": bigrams [ab,ba,ab,ba,ab] all duplicated -> dup2 5/5;
      // trigrams [aba,bab,aba,bab] all dup -> 4/4; 4-grams [abab,baba,abab]
      // -> abab twice, baba once -> dup4 2/3. top bigram "a b" (3 > 2)
      (1L, "a b a b a b"),
      // fully diverse: nothing repeats at any n
      (2L, "one two three four five"),
      // shorter than 4 tokens: filtered out entirely
      (3L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!got.contains(3L))
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_tokens") == 6)
    assert(r1.getAs[String]("top_bigram") == "a b")
    assert(r1.getAs[Long]("dup2_count") == 5 &&
      r1.getAs[Double]("dup2_frac") == 1.0)
    assert(r1.getAs[Long]("dup3_count") == 4 &&
      r1.getAs[Double]("dup3_frac") == 1.0)
    assert(r1.getAs[Long]("dup4_count") == 2 &&
      r1.getAs[Double]("dup4_frac") == 2.0 / 3.0)
    val r2 = got(2L)
    assert(r2.getAs[Long]("dup2_count") == 0 &&
      r2.getAs[Long]("dup3_count") == 0 &&
      r2.getAs[Long]("dup4_count") == 0)
    // tie-break: all bigrams occur once -> lexicographically smallest
    assert(r2.getAs[String]("top_bigram") == "four five")
  }

  test("keep-list: longest member wins, ties by id, singletons kept") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 5L))
      .toDF("doc_id", "n_chars")
    // docs 1-3 form one near-dup cluster; doc 4 is in no pair
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L))
      .toDF("vec_id", "cluster_id")
    val out = Dedup.canonicalKeepList(docs, clusters).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
    assert(out == Seq(
      (1L, 1L, 3L, false),  // shorter than the winners
      (2L, 1L, 3L, true),   // max chars, lowest id among the tie
      (3L, 1L, 3L, false),  // tied on chars, loses the id tie-break
      (4L, 4L, 1L, true)))  // singleton: own cluster, kept
  }

  test("unigramSurprise scores in whole bits against the corpus LM") {
    import spark.implicits._
    // corpus: a x3, b x1, c x1 -> N=5, ilog2(5)=2
    // bits(a)=2-ilog2(3)=1, bits(b)=bits(c)=2-0=2
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprise(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 3L, 4L, 4.0 / 3.0, 2L),  // 1+1+2 bits over 3 tokens
      (2L, 2L, 3L, 1.5, 2L)))       // 1+2 bits over 2 tokens
  }

  test("dsirWeights: whole-bit LM ratio ranks target-like docs highest") {
    import spark.implicits._
    // target src0 LM: apple x3, banana x2 (n_t=5); rest LM: apple x1,
    // car x2, truck x2 (n_r=5). ilog2(n_t)=ilog2(n_r)=2 cancels, so
    // bits(tok) = ilog2(tf_t+1) - ilog2(tf_r+1):
    // apple 2-1=1, banana 1-0=1, car 0-1=-1, truck 0-1=-1
    val docs = Seq(
      (1L, "apple apple banana", "src0"),
      (2L, "apple banana", "src0"),
      (3L, "car car truck", "src1"),
      (4L, "apple truck", "src1")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.dsirWeights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 1.0),   // 1+1+1 bits
      (2L, 2L, 2L, 1.0),   // 1+1
      (3L, 3L, -3L, -1.0), // -1-1-1: pure rest-vocab scores lowest
      (4L, 2L, 0L, 0.0)))  // 1-1: mixed doc sits between
  }

  test("sourceDivergence: equal sources tie, drifted source scores higher") {
    import spark.implicits._
    // srcA and srcB each "a b" (exactly the corpus mix restricted to
    // their mass); srcC is all-c — maximal drift on this vocabulary
    val docs = Seq((1L, "a b", "srcA"), (2L, "a b", "srcB"),
      (3L, "c c", "srcC")).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toMap
    val (nA, termsA, presA, chiA) = rows("srcA")
    val (_, _, presC, chiC) = rows("srcC")
    assert(nA == 2 && termsA == 3 && presA == 2 && presC == 1)
    // srcA observed == expected on every term except c (expected 2/3,
    // observed 0) -> small positive; srcC concentrates all mass on the
    // rarest-for-it terms -> strictly larger
    assert(chiA >= 0.0 && chiC > chiA)
    assert(rows("srcA") == rows("srcB")) // symmetric inputs, equal scores
  }

  test("minhash estimate is exact for identical docs and bounded overall") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog yesterday"),
      (4L, "completely unrelated text about spark catalyst planning"))
      .toDF("doc_id", "text")
    val rows = Dedup.minhashJaccardEval(docs).collect()
    val byPair = rows.map(r => (r.getAs[Long]("doc_a"),
      r.getAs[Long]("doc_b")) -> r).toMap
    // identical docs: identical shingle sets -> identical signatures
    val dup = byPair((1L, 2L))
    assert(dup.getAs[Double]("jaccard") == 1.0)
    assert(dup.getAs[Long]("n_agree") == 12L)
    assert(dup.getAs[Double]("est_jaccard") == 1.0)
    // every estimate is a valid fraction of the signature width
    assert(rows.forall { r =>
      val a = r.getAs[Long]("n_agree")
      a >= 0L && a <= 12L &&
        r.getAs[Double]("est_jaccard") == a.toDouble / 12.0
    })
  }

}

/** Containment (d12) and code detection (t28) on a readable mini-corpus
  * (fixture-scale behavior is pinned by their oracles). */
class ContainmentCodeDetectSpec extends graft.SparkSpec {

  private lazy val corpus: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "a quick brown fox jumps over the lazy dog near the river bank today"),
      (4L, "completely different content about spark query engines and shuffles"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
  }

  test("containment finds the synthetic excerpts Jaccard misses") {
    // containmentPairs doubles its input with 200-char prefix excerpts
    // under id+1000000; every excerpt must score containment 1.0 toward
    // its original (a contiguous prefix's word 3-grams are a subset of
    // the original's). All mini-corpus docs are < 200 chars, so here
    // each excerpt is a bitwise-identical copy and BOTH orientations
    // score exactly 1.0; fixture-scale behavior (true prefixes, the
    // directed relation) is pinned by the d12 oracle.
    val rows = Dedup.containmentPairs(corpus, maxDocFreq = None).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    for (id <- Seq(1L, 2L, 3L, 4L, 5L)) {
      assert(rows.get((id + 1000000L, id)).contains(1.0),
        s"excerpt of $id should be fully contained in it: $rows")
      assert(rows.get((id, id + 1000000L)).contains(1.0),
        s"identical-copy excerpt must contain its original too")
    }
    // the exact-dup pair (1,2) is mutually contained, both directions
    assert(rows.get((1L, 2L)).contains(1.0) &&
      rows.get((2L, 1L)).contains(1.0))
    // directedness: every surviving pair's score is |A∩B|/|A| ≥ 0.9
    assert(rows.values.forall(c => c >= 0.9 && c <= 1.0))
  }

  test("novelty profile scores exact dups 1.0 and unique docs 0.0") {
    // docs 1,2 are byte-identical -> every shingle has df >= 2 -> share
    // 1.0; doc 4 shares no 3-gram with anything -> 0.0; doc 3 (near dup
    // of 1) sits strictly between
    val got = TextAnalysis.noveltyProfile(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("boilerplate_share")).toMap
    assert(got(1L) == 1.0 && got(2L) == 1.0)
    assert(got(4L) == 0.0 && got(5L) == 0.0)
    assert(got(3L) > 0.0 && got(3L) < 1.0)
  }

  test("code detector splits the prose/code-ified union at the id " +
      "boundary") {
    val got = TextAnalysis.codeDetect(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_code"))
      .toMap
    assert(got.size == 10) // 5 prose + 5 code-ified
    for ((id, isCode) <- got) {
      assert(isCode == (id >= 1000000L),
        s"doc $id labeled is_code=$isCode — boundary contract broken")
    }
    // symbol accounting: f("tok"); wraps each token in exactly 3
    // counted symbols — ( ) ; — and none of { } = ; check one row exactly
    val row5 = TextAnalysis.codeDetect(corpus).filter(col("doc_id") ===
      1000005L).collect().head // code-ified "tiny doc": 2 tokens
    assert(row5.getAs[Long]("n_sym") == 6L)
    assert(row5.getAs[Long]("n_lines") == 2L)
  }

  test("bigramSurprise scores whole bits under the corpus bigram LM") {
    import spark.implicits._
    // bigrams: doc1 (a,b),(b,a); doc2 (a,b). cb(a,b)=2, cb(b,a)=1.
    // contexts: cu(a)=2, cu(b)=1. vocab {a,b,z} -> V=3.
    // bits(a,b) = ilog2(2+3) - ilog2(2+1) = 2 - 1 = 1
    // bits(b,a) = ilog2(1+3) - ilog2(1+1) = 2 - 1 = 1
    val docs = Seq((1L, "a b a"), (2L, "a b"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprise(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // doc 3 has no bigram and is excluded
    assert(out == Seq(
      (1L, 2L, 2L, 1.0, 1L),
      (2L, 1L, 1L, 1.0, 1L)))
  }

  test("bigramSurprise on the fixture: non-negative, repartition-stable") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.bigramSurprise(docs).collect()
    assert(out.nonEmpty)
    // cb <= cu and V >= 2 force every whole-bit surprise >= 0
    assert(out.forall(_.getAs[Long]("sum_bits") >= 0L))
    val repart = TextAnalysis.bigramSurprise(docs.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(repart == out.map(_.toSeq).toSeq)
  }

  test("fuzzyDecontamination flags band collisions with the bench set") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (100L, t),                      // benchmark (id % 100 == 0)
      (7L, t),                        // exact copy -> all bands agree
      (8L, "completely unrelated words about spark shuffles and joins"),
      (200L, "another benchmark item entirely"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fuzzyDecontamination(docs,
      col("doc_id") % 100 === 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bench_matches"), r.getAs[Long]("n_band_hits"),
          r.getAs[Long]("first_bench_id")))).toMap
    assert(out == Map(7L -> ((1L, 4L, 100L))))
  }

  test("fuzzy decontamination agrees with the d04 candidate generator") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = col("doc_id") % 10 === 0
    val flagged = TextAnalysis.fuzzyDecontamination(docs, bench)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // every flagged doc is on the train side, and the fixture's
    // near-dup pairs straddle the %10 boundary so the path fires
    assert(flagged.nonEmpty, "p05 must fire on the fixture")
    assert(flagged.forall(_ % 10 != 0))
    // consistency with d04: same signatures, same bands — every LSH
    // candidate pair with exactly one bench member must flag its
    // train member
    val straddling = Dedup.lshCandidates(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .collect {
        case (a, b) if a % 10 == 0 && b % 10 != 0 => b
        case (a, b) if a % 10 != 0 && b % 10 == 0 => a
      }.toSet
    assert(straddling.nonEmpty, "fixture lost its straddling pairs")
    assert(straddling.subsetOf(flagged),
      s"d04 candidates missed by p05: ${straddling -- flagged}")
  }

  test("substringDups finds the shared 5-token span and nothing else") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),          // windows: "a b c d e", "b c d e f"
      (2L, "x a b c d e y"),        // shares exactly "a b c d e"
      (3L, "p q r s t u v w"))      // unrelated
      .toDF("doc_id", "text")
    val got = Dedup.substringDups(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Double]("containment")))
    assert(got.toSeq == Seq((1L, 2L, 1L, 2L, 3L, 0.5)))
  }

  test("quality feature table matches each signal column-for-column") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.qualityFeatures(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == docs.count(), "one feature row per document")
    val q = TextAnalysis.qualityScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality"))
      .toMap
    val u = TextAnalysis.unigramSurprise(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_bits"))
      .toMap
    val rp = TextAnalysis.repetitionProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup2_frac"))
      .toMap
    val cd = TextAnalysis.codeDetect(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_code"))
      .toMap
    for ((id, row) <- out) {
      assert(row.getAs[Double]("quality") == q(id))
      assert(row.getAs[Double]("mean_bits") == u(id))
      rp.get(id) match {
        case Some(f) => assert(row.getAs[Double]("dup2_frac") == f)
        case None => assert(row.isNullAt(row.fieldIndex("dup2_frac")),
          s"short doc $id must carry a NULL dup2_frac")
      }
      assert(row.getAs[Boolean]("is_code") == cd(id))
    }
  }

  test("substringDups: exact copies reach containment 1.0; stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different sentence about spark plans here"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDups(docs).collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    assert(got == Map((1L, 2L) -> 1.0))
    // fixture: non-trivial and repartition-stable
    val fix = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.substringDups(fix).collect().map(_.toSeq).toSeq
    assert(out.nonEmpty)
    assert(out == Dedup.substringDups(fix.repartition(7)).collect()
      .map(_.toSeq).toSeq)
  }

  test("semanticDecontam (p18): exact cosines, argmax tie to the " +
      "lower eval id, threshold flag") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), // eval (id % 100 == 0)
      (200L, Array(0.0f, 1.0f)), // eval
      (1L, Array(1.0f, 0.0f)), // exact copy of eval 0
      (2L, Array(0.0f, 1.0f)), // exact copy of eval 200
      (3L, Array(1.0f, 1.0f)), // 1/sqrt(2) to BOTH evals: tie -> 0
      (4L, Array(-1.0f, 0.1f)) // clean: max cos ~0.0995 < 0.35
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDecontam(vecs, col("vec_id") % 100 === 0)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("nearest_eval_id"), r.getAs[Double]("max_cos"),
          r.getAs[Boolean]("contaminated")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((0L, 1.0, true)))
    assert(got(2L) == ((200L, 1.0, true)))
    val (ne3, cos3, c3) = got(3L)
    assert(ne3 == 0L && c3) // bitwise-equal cosines tie to eval 0
    assert(cos3 == math.sqrt(2.0) / 2.0 ||
      math.abs(cos3 - 1.0 / math.sqrt(2.0)) < 1e-12)
    val (ne4, cos4, c4) = got(4L)
    assert(ne4 == 200L && !c4 && cos4 < 0.35)
  }
}
