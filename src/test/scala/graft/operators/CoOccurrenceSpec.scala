package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 profiling/sampling additions: co-visitation edge semantics
  * (cap, symmetry, lift), cumulative windowed distinct, weighted
  * sampling boundaries, vocab-coverage monotonicity, FD-audit verdicts. */
class CoOccurrenceSpec extends SparkSpec {

  import spark.implicits._

  test("covisitation cap bounds a whale user's pair contribution") {
    // one whale touches items a..f (6 distinct); cap=4 keeps its top-4
    // by count (ties by item id) — pairs with the 2 dropped items must
    // not exist, and the kept pairs are exactly C(4,2)=6
    val rows = Seq("a", "a", "a", "b", "b", "c", "c", "d", "e", "f")
      .map(t => (1L, t))
    val events = rows.toDF("user_id", "event_type")
    val edges = CoOccurrence.covisitationEdges(events, cap = 4).collect()
    // top-4 for the whale: a(3), b(2), c(2), d(1) — e and f dropped
    assert(edges.length == 6)
    val items = edges.flatMap(r => Seq(r.getAs[String]("item_a"),
      r.getAs[String]("item_b"))).toSet
    assert(items == Set("a", "b", "c", "d"))
    assert(edges.forall(r =>
      r.getAs[String]("item_a") < r.getAs[String]("item_b")),
      "edges must be canonical (item_a < item_b), no mirrored duplicates")
  }

  test("covisitation lift is support normalized by item popularity") {
    // 4 users: {a,b} together twice, {a,c} once, c alone once
    val events = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"), (4L, "c")).toDF("user_id", "event_type")
    val edges = CoOccurrence.covisitationEdges(events, cap = 4)
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("lift"))).toMap
    // n(a)=3, n(b)=2, n(c)=2, U=4; ab: 2·4/(3·2); ac: 1·4/(3·2)
    assert(edges(("a", "b")) == ((2L, 8.0 / 6.0)))
    assert(edges(("a", "c")) == ((1L, 4.0 / 6.0)))
    assert(!edges.contains(("b", "c")), "never-co-occurring pair emitted")
  }

  test("cumulative distinct equals the running set size") {
    val events = Seq(
      (1L, 10L, "x"), (1L, 11L, "y"), (1L, 12L, "x"), (1L, 13L, "z"),
      (2L, 20L, "x"), (2L, 21L, "x"))
      .map { case (u, e, t) =>
        (u, e, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${e}%02d"), t)
      }.toDF("user_id", "event_id", "ts", "event_type")
    val got = Windows.cumulativeDistinctTypes(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("distinct_types")).toMap
    assert(got == Map((1L, 10L) -> 1L, (1L, 11L) -> 2L, (1L, 12L) -> 2L,
      (1L, 13L) -> 3L, (2L, 20L) -> 1L, (2L, 21L) -> 1L))
  }

  test("weighted sample keeps all full-weight rows and no zero-weight rows") {
    val docs = (0L until 200L).map(i =>
      (i, "en", if (i % 2 == 0) 400L else 0L)).toDF(
      "doc_id", "lang", "n_chars")
    val kept = Sampling.weightedSample(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 200L).filter(_ % 2 == 0).toSet,
      "weight=max must always keep; weight=0 must never keep")
  }

  test("weighted sample keep rate tracks the weight") {
    // weight w keeps ~w/400 of rows; at 4000 rows per bucket the
    // md5-uniform draw stays well within loose bounds
    val docs = (0L until 8000L).map(i =>
      (i, "en", if (i < 4000) 100L else 300L)).toDF(
      "doc_id", "lang", "n_chars")
    val kept = Sampling.weightedSample(docs).collect()
      .groupBy(_.getAs[Long]("n_chars")).view.mapValues(_.length).toMap
    val lo = kept.getOrElse(100L, 0)
    val hi = kept.getOrElse(300L, 0)
    assert(lo > 700 && lo < 1300, s"~25% of 4000 expected, got $lo")
    assert(hi > 2600 && hi < 3400, s"~75% of 4000 expected, got $hi")
  }

  test("vocab coverage is monotone and hits 1.0 once vocab is covered") {
    val docs = Seq((0L, "a a a b b c"), (1L, "a b c d"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.vocabCoverage(docs, sizes = Seq(1, 2, 4))
      .collect()
    val cov = rows.map(r => r.getAs[Long]("vocab_size") ->
      r.getAs[Double]("coverage")).toMap
    // counts: a=4, b=3, c=2, d=1 (10 total)
    assert(cov(1L) == 0.4 && cov(2L) == 0.7 && cov(4L) == 1.0)
    assert(rows.forall(r => r.getAs[Long]("total_tokens") == 10L))
  }

  test("vocabGrowth (t45): nested prefixes match a local replay; the " +
      "full-corpus row is exact") {
    // replicate the tier law locally: first hex digit of md5(doc_id)
    def hexv(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(h.charAt(0))
    }
    val docs = (0L until 40L)
      .map(i => (i, s"common tok$i shared${i % 5} common"))
    val df = docs.toDF("doc_id", "text")
    val rows = TextAnalysis.vocabGrowth(df).collect()
      .map(r => r.getAs[Long]("prefix_16ths") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("vocab_types"))).toMap
    for (th <- Seq(1L, 2L, 4L, 8L, 16L) if rows.contains(th)) {
      val in = docs.filter { case (id, _) => hexv(id) < th }
      val toks = in.flatMap(_._2.split("\\s+"))
      assert(rows(th) == ((in.size.toLong, toks.size.toLong,
        toks.distinct.size.toLong)), s"prefix $th")
    }
    // the full-corpus row always exists and covers everything
    assert(rows(16L)._1 == 40L)
    // growth curves are monotone in the prefix
    val present = Seq(1L, 2L, 4L, 8L, 16L).filter(rows.contains)
    present.zip(present.tail).foreach { case (a, b) =>
      assert(rows(a)._1 <= rows(b)._1 && rows(a)._2 <= rows(b)._2 &&
        rows(a)._3 <= rows(b)._3)
    }
  }

  test("pmi ranks an exclusive pair above a popular-word pair") {
    // "rare gem" always co-occur and appear nowhere else; "the end"
    // co-occurs as often but 'the' is everywhere → lower association
    val docs = Seq(
      (0L, "rare gem the end the story the tale"),
      (1L, "rare gem the end the story the tale"),
      (2L, "rare gem the end the story the tale"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.pmiCollocations(docs, minCount = 3L, k = 50)
      .collect()
    val ratio = rows.map(r => (r.getAs[String]("w1"),
      r.getAs[String]("w2")) -> r.getAs[Double]("pmi_ratio")).toMap
    assert(ratio(("rare", "gem")) > ratio(("the", "end")),
      s"exclusive pair must outrank the stopword pair: $ratio")
    // 8 tokens/doc, 3 docs → N=24; c_xy=c_x=c_y=3 → ratio = 3·24/9 = 8
    assert(ratio(("rare", "gem")) == 3.0 * 24.0 / 9.0)
  }

  test("tfidf keywords rank a doc's distinctive term above common ones") {
    // 'zebra' appears only in doc 0; 'the' in every doc — zebra's
    // idf dominates regardless of tf
    val docs = Seq(
      (0L, "the zebra zebra runs"),
      (1L, "the cat sleeps all day"),
      (2L, "the dog barks all night"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tfidfKeywords(docs, k = 2).collect()
    val top0 = rows.filter(r => r.getAs[Long]("doc_id") == 0L &&
      r.getAs[Long]("rk") == 1L).head
    assert(top0.getAs[String]("tok") == "zebra")
    // score = tf*N/df = 2*3/1 = 6.0 exactly; 'the' scores 1*3/3 = 1.0
    assert(top0.getAs[Double]("tfidf") == 6.0)
    // ranks are dense 1..k per doc
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.values.forall(
      _.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L)))
  }

  test("cms estimates are one-sided and exact for collision-free tokens") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextAnalysis.cmsTokenCounts(docs).collect()
    assert(rows.nonEmpty)
    // one-sided error: a count-min estimate can never undercount
    assert(rows.forall(_.getAs[Long]("overestimate") >= 0L),
      "count-min must never underestimate")
    // with ~31 tokens in 3x256 buckets, most rows are collision-free
    // and the estimate is EXACT — the high-accuracy regime the oracle
    // hash-checks
    val exactRows = rows.count(_.getAs[Long]("overestimate") == 0L)
    assert(exactRows * 2 > rows.length,
      s"expected mostly collision-free estimates, got $exactRows/${rows.length}")
  }

  test("fd audit distinguishes held from violated dependencies") {
    val df = Seq((1L, "x", "p"), (1L, "x", "q"), (2L, "y", "p"),
      (3L, "y", "p")).toDF("k", "held_dep", "viol_dep")
    // k -> held_dep: each k maps to one value; k -> viol_dep: k=1 maps
    // to {p,q}
    val out = DataQuality.fdAudit(Seq(
      ("holds", df, "k", "held_dep"),
      ("violated", df, "k", "viol_dep"))).collect()
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violating"), r.getAs[Long]("max_variants"),
          r.getAs[Boolean]("holds"))).toMap
    assert(out("holds") == ((0L, 1L, true)))
    assert(out("violated") == ((1L, 2L, false)))
  }
}
