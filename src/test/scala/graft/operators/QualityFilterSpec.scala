package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of the pretraining quality-filter canon (t35 Gopher rules,
  * t36 C4 line cleaning, t37 CCNet buckets) on crafted corpora — the
  * fixture-level behavior is oracle-checked; these pin hand-computable
  * cases: the page render's line math, rule conjunctions, the cleaned-doc
  * reassembly, and the two-level rank's agreement with a global sort. */
class QualityFilterSpec extends SparkSpec {

  // six-token docs render to exactly one base line + one extra line,
  // with decoration keyed on (doc_id + line_no): doc 0 → terminal '.',
  // doc 1 → '...' (1%3=1, 1%7=1), doc 2 → '- ' bullet (2%5=2)
  private lazy val six: DataFrame = {
    import spark.implicits._
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six"),
      (2L, "red green blue cyan magenta yellow")
    ).toDF("doc_id", "text")
  }

  test("syntheticLines: chunking, decoration, and extras are as designed") {
    val lines = TextAnalysis.syntheticLines(six)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(lines.length == 6) // one base line + one extra per doc
    assert(lines(0)._3 == "alpha beta gamma delta epsilon zeta.")
    assert(lines(1)._3 == "lorem ipsum dolor sit amet.")
    assert(lines(2)._3 == "one two three four five six...")
    assert(lines(3)._3 == "function() { return 42; }")
    assert(lines(4)._3 == "- red green blue cyan magenta yellow")
    assert(lines(5)._3 == "# header ## section 42")
  }

  test("gopherRules: metrics and rule conjunction on hand-computed docs") {
    val rows = TextAnalysis.gopherRules(six).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0 page: "alpha beta gamma delta epsilon zeta." +
    // "lorem ipsum dolor sit amet." = 6 + 5 words, no '#', no '...'
    val d0 = rows(0L)
    assert(d0.getAs[Long]("n_lines") == 2L)
    assert(d0.getAs[Long]("n_words") == 11L)
    assert(d0.getAs[Double]("symbol_ratio") == 0.0)
    assert(!d0.getAs[Boolean]("r_word_count")) // 11 < 50
    assert(!d0.getAs[Boolean]("keep"))
    // doc 1: one '...' line of two total → ellipsis_frac 0.5 > 0.3
    val d1 = rows(1L)
    assert(d1.getAs[Double]("ellipsis_frac") == 0.5)
    assert(!d1.getAs[Boolean]("r_ellipsis"))
    // doc 2: one bullet line of two; page has '#' marks from the extra
    val d2 = rows(2L)
    assert(d2.getAs[Double]("bullet_frac") == 0.5)
    assert(d2.getAs[Boolean]("r_bullet")) // 0.5 <= 0.9
    assert(d2.getAs[Long]("n_required_stops") == 0L)
    assert(!d2.getAs[Boolean]("r_stop"))
    // keep is exactly the conjunction of the seven rule columns
    TextAnalysis.gopherRules(six).collect().foreach { r =>
      val conj = Seq("r_word_count", "r_word_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop")
        .forall(r.getAs[Boolean])
      assert(r.getAs[Boolean]("keep") == conj)
    }
  }

  test("c4LineFilter: kept lines, reassembly hash, zero-kept edge") {
    val rows = TextAnalysis.c4LineFilter(six).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0: base line ends '.', extra is 'lorem ipsum ...' → dropped
    val d0 = rows(0L)
    assert(d0.getAs[Long]("n_kept") == 1L)
    val expected = "alpha beta gamma delta epsilon zeta."
    assert(d0.getAs[Long]("n_clean_chars") == expected.length.toLong)
    val md5Hex = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d0.getAs[String]("clean_md5") == md5Hex)
    // doc 2: bullet base line (no '.') + '#' extra (no '.') → nothing
    val d2 = rows(2L)
    assert(d2.getAs[Long]("n_kept") == 0L)
    assert(d2.getAs[Long]("n_clean_chars") == 0L)
    val emptyMd5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert(d2.getAs[String]("clean_md5") == emptyMd5)
  }

  test("c4LineFilter drops brace lines (doc 1's code extra)") {
    val d1 = TextAnalysis.c4LineFilter(six)
      .filter(col("doc_id") === 1L).head()
    // base line ends '...' → right(1)='.' so it IS terminal-kept;
    // the code extra has '{' → dropped
    assert(d1.getAs[Long]("n_kept") == 1L)
  }

  test("ccnetBuckets: distributed rank equals a global sort's row_number") {
    val docs = Tables.documentsLike(spark)
    val out = TextAnalysis.ccnetBuckets(docs).collect()
    val n = out.length
    // ranks are a permutation of 1..n
    assert(out.map(_.getAs[Long]("ppl_rank")).sorted.toSeq ==
      (1L to n.toLong).toSeq)
    // and agree with sorting by (mean_bits, doc_id)
    val sorted = out.sortBy(r =>
      (r.getAs[Double]("mean_bits"), r.getAs[Long]("doc_id")))
    sorted.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("ppl_rank") == i + 1L)
      val expected =
        if (i * 3 < n) "head" else if (i * 3 < 2 * n) "middle" else "tail"
      assert(r.getAs[String]("ppl_bucket") == expected)
    }
  }

  test("smoothedLmScore: fluent repetition beats diverse content, bits >= 0") {
    import spark.implicits._
    // doc 1: one deterministic bigram pattern (every context has ONE
    // continuation -> p(w|u) ~ 3/4 + unigram mass, zero quantized
    // bits). doc 2: context x fans out to SIX continuations -> its
    // (x,*) bigrams cost ~3 bits each. doc 3: mostly doc-1's pattern
    // plus two diverse x-bigrams -> strictly between. NOTE a doc of
    // all-unique words scores ~0 here, NOT high: with no discounting a
    // hapax context predicts its single continuation perfectly — high
    // perplexity needs REUSED contexts with diverse continuations.
    val docs = Seq(
      (1L, Array.fill(12)("alpha beta").mkString(" "), "en", "s"),
      (2L, "x one x two x three x four x five x six", "en", "s"),
      (3L, "alpha beta alpha beta x seven x eight", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.smoothedLmScore(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3)
    out.values.foreach { r =>
      assert(r.getAs[Long]("sum_bits") >= 0L, "negative bits: p > 1?") }
    val mean = out.map { case (id, r) =>
      id -> r.getAs[Double]("mean_bits") }
    assert(mean(1L) < mean(3L) && mean(3L) < mean(2L),
      s"LM ordering broke: $mean")
    // terciles over 3 docs: exactly one head, one middle, one tail,
    // assigned in mean_bits order
    val buckets = out.map { case (id, r) =>
      id -> r.getAs[String]("ppl_bucket") }
    assert(buckets == Map(1L -> "head", 3L -> "middle", 2L -> "tail"))
  }

  test("smoothedLmScore: interpolation scores unseen-context mass by " +
      "unigram frequency, not a fixed OOV ceiling") {
    import spark.implicits._
    // 'common' appears 12x corpus-wide, 'rare' once; both occur exactly
    // once as the continuation of context 'x' (cb=1). Under t33's raw
    // count surprise both bigrams score identically; the interpolated
    // unigram term must rank p(common|x) > p(rare|x)
    val docs = Seq(
      (1L, "x common", "en", "s"),
      (2L, "x rare", "en", "s"),
      (3L, Array.fill(11)("common").mkString(" "), "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.smoothedLmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_bits")).toMap
    // doc1's single bigram (x,common) must cost no more bits than
    // doc2's (x,rare): same cb/cu, larger unigram mass
    assert(out(1L) <= out(2L),
      s"interpolated unigram mass ignored: $out")
  }

  test("gopherKeepExpr: stateless expr matches batch gopherRules bitwise") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val stateless = docs.select(col("doc_id"),
      TextAnalysis.gopherKeepExpr(col("doc_id"), col("text")).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    assert(stateless.keySet == batch.keySet)
    val diff = batch.keySet.filter(id => batch(id) != stateless(id))
    assert(diff.isEmpty, s"parity broke for docs $diff")
    assert(batch.values.exists(identity) && batch.values.exists(!_),
      "fixture must have both keeps and drops — vacuous otherwise")
  }

  test("gateMetrics: the one-render aggregate matches gopherRules and " +
      "c4LineFilter column-for-column") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = TextAnalysis.gateMetrics(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val g = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val c = TextAnalysis.c4LineFilter(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_clean_chars"))).toMap
    assert(got.keySet == g.keySet && got.keySet == c.keySet)
    for ((id, row) <- got) {
      assert(row.getAs[Boolean]("gopher_keep") == g(id), s"doc $id keep")
      assert(row.getAs[Long]("n_kept") == c(id)._1, s"doc $id n_kept")
      assert(row.getAs[Long]("n_clean_chars") == c(id)._2, s"doc $id chars")
    }
    // vacuity guard: the fixture must exercise both outcomes
    assert(g.values.exists(identity) && g.values.exists(!_))
  }

  test("curatedCorpusV2: verdict is the FIRST failing gate, in order") {
    val docs = Tables.documentsLike(spark)
    val out = TextAnalysis.curatedCorpusV2(docs).collect()
    assert(out.length == 9)
    val g = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val c = TextAnalysis.c4LineFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_kept")).toMap
    val b = TextAnalysis.ccnetBuckets(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("ppl_bucket")).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val expected =
        if (!g(id)) "drop_gopher"
        else if (c(id) == 0L) "drop_empty"
        else if (b(id) == "tail") "drop_ppl"
        else "keep"
      assert(r.getAs[String]("verdict") == expected, s"doc $id")
    }
  }

  test("globalLineDedup: duplicate doc loses every line to the first") {
    import spark.implicits._
    // 420 = lcm(3,4,5,7): identical text AND identical decoration +
    // extras as doc 0, so its whole render collides byte-for-byte.
    // The control doc is 9, not 8: 8 % 4 == 0 would share doc 0's
    // boilerplate extra and (correctly) lose that one line.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (420L, "alpha beta gamma delta epsilon zeta"),
      (9L, "totally different words entirely here now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.globalLineDedup(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 0 keeps everything; doc 420's render is byte-identical so
    // every line defers to doc 0's first occurrence
    assert(out(0L).getAs[Long]("n_kept") == out(0L).getAs[Long]("n_lines"))
    assert(out(420L).getAs[Long]("n_kept") == 0L)
    assert(out(420L).getAs[Long]("n_dropped") ==
      out(420L).getAs[Long]("n_lines"))
    assert(out(420L).getAs[String]("clean_md5") ==
      "d41d8cd98f00b204e9800998ecf8427e")
    assert(out(9L).getAs[Long]("n_kept") == out(9L).getAs[Long]("n_lines"))
  }

  test("mojibakeRepair: hand-computed damage counts and repaired text") {
    import spark.implicits._
    val docs = Seq(
      (0L, "menu says"), // %3==0: gets cafA~A(c)/menA~A1/4 suffix
      (1L, "note"),      // %3==1: gets the E2/20AC/2122 quote suffix
      (2L, "clean text stays clean") // untouched
    ).toDF("doc_id", "text")
    val out = TextAnalysis.mojibakeRepair(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d0 = out(0L)
    assert(d0.getAs[Long]("n_mojibake") == 2L)
    assert(d0.getAs[Boolean]("changed"))
    assert(d0.getAs[String]("fixed_md5") ==
      md5("menu says café menü"))
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_mojibake") == 1L)
    assert(d1.getAs[String]("fixed_md5") ==
      md5("note don’t worry"))
    assert(d1.getAs[Long]("raw_len") - d1.getAs[Long]("fixed_len") == 2L)
    val d2 = out(2L)
    assert(d2.getAs[Long]("n_mojibake") == 0L)
    assert(!d2.getAs[Boolean]("changed"))
    assert(d2.getAs[String]("fixed_md5") == md5("clean text stays clean"))
  }

  test("p11 learnedQualityFilter: cells partition the corpus and " +
      "margins respect the threshold cut") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.learnedQualityFilter(docs).collect()
    assert(out.nonEmpty)
    // the agreement table partitions the corpus exactly
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // cell keys are unique and the margin extremes honor keep = m > 0
    val keys = out.map(r => (r.getAs[String]("verdict"),
      r.getAs[Boolean]("learned_keep")))
    assert(keys.distinct.length == keys.length)
    for (r <- out) {
      val mn = r.getAs[Double]("min_margin")
      val mx = r.getAs[Double]("max_margin")
      assert(mn <= mx)
      if (r.getAs[Boolean]("learned_keep")) assert(mn > 0.0)
      else assert(mx <= 0.0)
    }
  }

  test("t49 mattr: hand-computed windows, all-repeat floor, and the " +
      "short-doc whole-TTR fallback") {
    import spark.implicits._
    val distinct26 = (1 to 26).map(i => s"w$i").mkString(" ")
    val repeat26 = Seq.fill(26)("x").mkString(" ")
    val docs = Seq(
      (1L, distinct26), // 2 windows, 25 distinct each -> mattr 1.0
      (2L, repeat26), // 2 windows, 1 distinct each -> 2/(2*25) = 0.04
      (3L, "a b c d e a b c d e") // 10 toks < W: fallback ttr 0.5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.mattr(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Double]("ttr"),
          r.getAs[Double]("mattr")))).toMap
    assert(got(1L) == ((2L, 1.0, 1.0)))
    assert(got(2L)._1 == 2L && got(2L)._2 == 1.0 / 26.0 &&
      got(2L)._3 == 2.0 / 50.0)
    assert(got(3L) == ((0L, 0.5, 0.5)))
    // MATTR's reason to exist: doc 2 and a LONGER all-repeat doc score
    // the same diversity where raw TTR would diverge by length
    val longer = Seq((9L, Seq.fill(100)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val l = TextAnalysis.mattr(longer).collect().head
    assert(l.getAs[Double]("mattr") == got(2L)._3)
    assert(l.getAs[Double]("ttr") < got(2L)._2)
  }

  test("t52 zipfProfile: hand-computed octave buckets, exact shares, " +
      "descending-cumulative mass") {
    import spark.implicits._
    // freqs: a=5 (octave 2), b=2 (octave 1), c=1, d=1 (octave 0);
    // V=4 types, T=9 tokens
    val docs = Seq((1L, "a a a a b b c"), (2L, "a d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfProfile(docs).collect()
      .map(r => (r.getAs[Long]("octave"), r.getAs[Long]("f_lo"),
        r.getAs[Long]("n_terms"), r.getAs[Long]("token_mass"),
        r.getAs[Double]("type_frac"), r.getAs[Double]("mass_frac"),
        r.getAs[Double]("cum_mass_frac")))
    assert(got.toSeq == Seq(
      (0L, 1L, 2L, 2L, 2.0 / 4.0, 2.0 / 9.0, 9.0 / 9.0),
      (1L, 2L, 1L, 2L, 1.0 / 4.0, 2.0 / 9.0, 7.0 / 9.0),
      (2L, 4L, 1L, 5L, 1.0 / 4.0, 5.0 / 9.0, 5.0 / 9.0)))
  }

  test("t52 zipfProfile on the fixture: conservation against " +
      "independent vocabulary and token counts; repartition-stable") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.zipfProfile(docs).collect()
    assert(out.nonEmpty)
    val vocab = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val v = vocab.distinct().count()
    val t = vocab.count()
    assert(out.map(_.getAs[Long]("n_terms")).sum == v)
    assert(out.map(_.getAs[Long]("token_mass")).sum == t)
    // the lowest octave's cumulative share covers the whole corpus
    assert(out.minBy(_.getAs[Long]("octave"))
      .getAs[Double]("cum_mass_frac") == 1.0)
    // integer law end to end: a different partitioning changes nothing
    val re = TextAnalysis.zipfProfile(docs.repartition(7)).collect()
    assert(out.map(_.toSeq).toSeq == re.map(_.toSeq).toSeq)
  }

  private object Tables {
    /** A small surprise-diverse corpus: repeated common words vs rare. */
    def documentsLike(s: org.apache.spark.sql.SparkSession): DataFrame = {
      import s.implicits._
      (0L until 9L).map { i =>
        val common = Seq.fill(6)("the cat sat").mkString(" ")
        val rare = s"zeta$i xylo$i quux$i vortex omega kappa"
        (i, if (i % 3 == 0) common else if (i % 3 == 1) rare
        else common + " " + rare, "en", s"src${i % 2}")
      }.toDF("doc_id", "text", "lang", "source")
    }
  }
}
