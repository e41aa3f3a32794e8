package graft.operators

import graft.SparkSpec

/** Chunking: window/stride fan-out and tail clamping. BM25: formula
  * spot-check against a hand-computed corpus plus ranking sanity. */
class RankingChunkingSpec extends SparkSpec {

  import spark.implicits._

  test("chunking fans out windows every stride and clamps the tail") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens
      (2L, "a b c"), // shorter than one window
      (3L, "") // empty text → [""] single pseudo-token
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, window = 64, stride = 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // doc 1: starts 0,48,96 → sizes 64, 52, 4
    assert(out.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0L, 0, 64), (1L, 1L, 48, 52), (1L, 2L, 96, 4)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0, 3)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, 0, 1)))
    // overlap: chunk 1 of doc 1 starts at token 49 (w49)
    val texts = TextAnalysis.chunkDocuments(docs, 64, 48)
      .collect().filter(_.getLong(0) == 1L).map(_.getString(4))
    assert(texts(1).startsWith("w49 ") && texts(0).startsWith("w1 "))
    assert(texts(2) == "w97 w98 w99 w100")
  }

  test("bm25 matches a hand-computed score and ranks by relevance") {
    val docs = Seq(
      (1L, "spark spark spark"),
      (2L, "spark x"),
      (3L, "y z")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25Rank(docs, terms = Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 3 matches nothing → absent; doc 1 (3x tf, on-avg length) wins
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 == 1L))
    // exact recomputation with the same double-precision fold
    val n = 3.0; val df = 2.0; val sumDl = 7.0
    val avgdl = sumDl / n
    val idf = (n - df + 0.5) / (df + 0.5)
    def score(tf: Double, dl: Double): Double =
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    assert(out(0)._3 == score(3.0, 3.0))
    assert(out(1)._3 == score(1.0, 2.0))
  }

  test("bm25 longer documents score below shorter at equal tf") {
    val docs = Seq(
      (1L, "spark " + (1 to 50).map(i => s"f$i").mkString(" ")),
      (2L, "spark alone")
    ).toDF("doc_id", "text")
    val out = Ranking.bm25Rank(docs, terms = Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.head._1 == 2L && out(0)._2 > out(1)._2)
  }

  test("rrfFusion: both-list docs outrank single-list docs; exact scores") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Ranking.rrfFusion(docs, emb).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val bm = Option(r.getAs[java.lang.Long]("bm25_rank"))
      val dn = Option(r.getAs[java.lang.Long]("dense_rank"))
      assert(bm.isDefined || dn.isDefined)
      val expected = bm.map(v => 1.0 / (60 + v)).getOrElse(0.0) +
        dn.map(v => 1.0 / (60 + v)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf_score") == expected)
    }
    // the fused list is sorted by score desc with id tie-break
    val scores = out.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("s35 recall curve: more sign bits buy recall on the fixture") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.hammingRecall(emb).collect()
    assert(out.length == 15)
    def mean(bits: Long) = {
      val rs = out.filter(_.getAs[Long]("n_bits") == bits)
        .map(_.getAs[Double]("recall"))
      rs.sum / rs.length
    }
    // no per-query monotonicity claim (sets aren't nested) — but the
    // fixture-level mean improves from the narrowest to widest code
    assert(mean(24L) > mean(8L),
      s"widest code no better than narrowest: ${mean(24L)} vs ${mean(8L)}")
  }

  test("prfExpansion (b03): expansion recalls a no-query-term doc, " +
      "mines the highest-df feedback term, skips stopwords") {
    val docs = Seq(
      (1L, "spark rdd cluster"),
      (2L, "spark rdd shuffle"),
      (3L, "rdd tuning notes"),
      (4L, "cat dog"),
      // stopword-heavy matcher: "the" must never be mined even though
      // it dominates the feedback set's term frequencies
      (5L, "spark the the the")
    ).toDF("doc_id", "text")
    val out = Ranking.prfExpansion(docs, terms = Seq("spark"),
      kFeedback = 3, nExpand = 1, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // feedback = docs 1, 2, 5 (the only "spark" matchers); candidate
    // df over them: rdd 2, cluster/shuffle 1, "the" excluded → rdd
    // mined → doc 3 (zero query terms) enters the ranking; doc 4 never
    val ids = out.map(_._1).toSet
    assert(ids == Set(1L, 2L, 3L, 5L))
    // n_terms counts matched union terms: 1+2 match both, 3 only rdd
    val nTerms = out.map(t => t._1 -> t._2).toMap
    assert(nTerms(1L) == 2L && nTerms(2L) == 2L &&
      nTerms(3L) == 1L && nTerms(5L) == 1L)
    // sorted by score desc, doc_id tie-break
    val scores = out.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("prfExpansion: beta exactly scales expansion-only scores " +
      "(bitwise — 0.5 is an exponent decrement)") {
    val docs = Seq(
      (1L, "spark rdd a"),
      (2L, "spark rdd b"),
      (3L, "rdd only here"),
      (4L, "unrelated words")
    ).toDF("doc_id", "text")
    def score3(beta: Double): Double =
      Ranking.prfExpansion(docs, terms = Seq("spark"), kFeedback = 2,
        nExpand = 1, beta = beta, k = 10)
        .collect().find(_.getLong(0) == 3L).get.getDouble(2)
    assert(score3(0.5) == 0.5 * score3(1.0))
    // determinism: the whole frame reproduces bitwise
    val a = Ranking.prfExpansion(docs, terms = Seq("spark")).collect()
    val b = Ranking.prfExpansion(docs, terms = Seq("spark")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("chunkMaxPRank (c02): best chunk points at the terms, ties " +
      "break to the lowest index, term-free docs are absent") {
    val filler = (1 to 48).map(i => s"filler$i").mkString(" ")
    val burst = Seq.fill(4)("vector spark join scan").mkString(" ")
    // docA: 48 filler + 16 term tokens + 48 filler = 112 tokens.
    // window 64 / stride 48: chunk 0 = tokens 1-64 and chunk 1 =
    // tokens 49-112 BOTH hold all 16 term tokens at dl 64 -> equal
    // scores, tie -> best_chunk_idx 0; chunk 2 (tail) has no terms.
    val docs = Seq(
      (1L, s"$filler $burst $filler"),
      (2L, "vector " + (1 to 9).map(i => s"pad$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"noise$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Ranking.chunkMaxPRank(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(out.keySet == Set(1L, 2L))
    val (bestA, nA, scoreA, rankA) = out(1L)
    assert(bestA == 0L && nA == 2L && scoreA > 0.0)
    val (bestB, nB, scoreB, rankB) = out(2L)
    assert(bestB == 0L && nB == 1L && scoreB > 0.0)
    // both docs are in the 2-doc whole-document top-k: ranks 1 and 2
    assert(Set(rankA, rankB) == Set(1L, 2L))
    // determinism
    val again = Ranking.chunkMaxPRank(docs).collect()
    assert(Ranking.chunkMaxPRank(docs).collect().map(_.toString).toSeq ==
      again.map(_.toString).toSeq)
  }

  test("chunkMaxPRank surfaces maxP-vs-doc-rank disagreement on the " +
      "fixture and stays bounded at k") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Ranking.chunkMaxPRank(docs).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getDouble(3) > 0.0))
    // order: maxp desc, doc_id tie-break
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("proximityRank (c03): equal bag scores split by span; " +
      "single-term docs get no boost") {
    import spark.implicits._
    // A and B: identical tf/dl (same bag score), different spans
    val pad = (1 to 10).map(i => s"p$i")
    val docs = Seq(
      (1L, ("spark" +: "join" +: pad).mkString(" ")), // gap 1
      (2L, (Seq("spark") ++ pad ++ Seq("join")).mkString(" ")), // gap 11
      (3L, ("spark" +: pad :+ "tail").mkString(" ")) // single term
    ).toDF("doc_id", "text")
    val got = Ranking.proximityRank(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("score") ==
      got(2L).getAs[Double]("score"))
    assert(got(1L).getAs[Long]("min_pair_dist") == 1L)
    assert(got(2L).getAs[Long]("min_pair_dist") == 11L)
    assert(got(1L).getAs[Double]("prox_score") ==
      got(1L).getAs[Double]("score") + 0.5)
    assert(got(2L).getAs[Double]("prox_score") ==
      got(2L).getAs[Double]("score") + 1.0 / 12.0)
    assert(got(1L).getAs[Double]("prox_score") >
      got(2L).getAs[Double]("prox_score"))
    assert(got(3L).getAs[Long]("min_pair_dist") == -1L)
    assert(got(3L).getAs[Double]("prox_score") ==
      got(3L).getAs[Double]("score"))
    // adjacency law: interleaved repeats still find the closest pair
    val inter = Seq((7L, "spark x spark join y")).toDF("doc_id", "text")
    assert(Ranking.proximityRank(inter).collect()
      .head.getAs[Long]("min_pair_dist") == 1L)
  }

  test("retrievalEval (b04): hand-computed P/R/MRR/AP on a 3-doc " +
      "ranking with a title-zone miss at rank 2") {
    import spark.implicits._
    // all 12 tokens long (equal dl ⇒ score orders by tf alone):
    // d1 tf=3 (one in title) > d2 tf=2 (both PAST the 10-token title
    // zone ⇒ retrieved but NOT relevant) > d3 tf=1 (in title)
    val pad = (1 to 9).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"vector $pad vector vector"),
      (2L, s"zzz $pad vector vector"),
      (3L, s"vector $pad yyy www"),
      (4L, s"aaa $pad bbb ccc")
    ).toDF("doc_id", "text")
    val rows = Ranking.retrievalEval(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("vector"))
    val r = rows.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(r.getAs[Double]("p_at_k") == 0.2)
    assert(r.getAs[Double]("r_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    // AP = (P@1·1 + P@2·0 + P@3·1)/min(n_rel,k), folded in rank order
    assert(r.getAs[Double]("ap_at_k") ==
      (((0.0 + 1.0) + 0.0) + 2.0 / 3.0) / 2.0)
  }

  test("retrievalNdcg (b05): hand-computed nDCG on the b04 fixture — " +
      "hits at ranks 1 and 3, ideal is the 2-relevant prefix") {
    import spark.implicits._
    val pad = (1 to 9).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"vector $pad vector vector"),
      (2L, s"zzz $pad vector vector"),
      (3L, s"vector $pad yyy www"),
      (4L, s"aaa $pad bbb ccc")
    ).toDF("doc_id", "text")
    val rows = Ranking.retrievalNdcg(docs).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("vector"))
    val r = rows.head
    assert(r.getAs[Long]("n_rel") == 2L)
    assert(r.getAs[Long]("n_hits") == 2L)
    val disc = Ranking.ndcgDiscounts(10)
    // DCG folds rel(r)·disc(r) in rank order: hits at ranks 1 and 3
    val dcg = ((0.0 + disc(0)) + 0.0) + disc(2)
    assert(r.getAs[Double]("dcg") == dcg)
    // IDCG = prefix sum of the first min(n_rel, k) = 2 discounts
    assert(r.getAs[Double]("ndcg_at_k") == dcg / Ranking.ndcgIdeals(10)(2))
    // bounds: an imperfect ranking is strictly below 1
    val v = r.getAs[Double]("ndcg_at_k")
    assert(v > 0.0 && v < 1.0)
  }

  test("ndcg discount/ideal tables: discounts strictly decreasing from " +
      "1.0, ideals are the exact rank-order prefix sums") {
    val d = Ranking.ndcgDiscounts(10)
    assert(d.head == 1.0)
    assert(d.sliding(2).forall { case Seq(a, b) => a > b; case _ => true })
    val id = Ranking.ndcgIdeals(10)
    assert(id.head == 0.0 && id.length == 11)
    var acc = 0.0
    for (m <- 1 to 10) { acc += d(m - 1); assert(id(m) == acc) }
  }

  test("qlDirichletRank (c04): hand-computed smoothed likelihoods; " +
      "every doc scored, tf and length prior both order") {
    import spark.implicits._
    // C = 8 total tokens, cf(spark) = 3
    val docs = Seq(
      (1L, "spark a"), // tf=1, dl=2
      (2L, "spark spark b c"), // tf=2, dl=4
      (3L, "x y") // tf=0, dl=2 — still scored (smoothed corpus mass)
    ).toDF("doc_id", "text")
    val out = Ranking.qlDirichletRank(docs, terms = Seq("spark"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_terms"),
        r.getAs[Long]("dl"), r.getAs[Double]("score")))
    def f(tf: Long, dl: Long): Double =
      (tf * 8L + 2000L * 3L).toDouble / (8L * (dl + 2000L)).toDouble
    // tf dominates at near-equal length; the zero-match doc trails
    assert(out.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(out.map(_._4).toSeq == Seq(f(2, 4), f(1, 2), f(0, 2)))
    assert(out.map(_._2).toSeq == Seq(1L, 1L, 0L))
  }

  test("qlDirichletRank: QL's length prior — a short zero-match doc " +
      "outranks a long tangential match; multi-term fixed-order product") {
    import spark.implicits._
    val filler = (1 to 400).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, s"spark $filler"), // one hit diluted across 401 tokens
      (2L, "tiny doc"), // no hit, 2 tokens
      (3L, "spark join") // both terms, 2 tokens
    ).toDF("doc_id", "text")
    val out = Ranking.qlDirichletRank(docs,
      terms = Seq("spark", "join"), k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_terms"),
        r.getAs[Double]("score")))
    // doc 3 matches both; doc 2's smoothed mass over 2 tokens beats
    // doc 1's single hit spread over 401 (the anti-BM25 signature)
    assert(out.map(_._1).toSeq == Seq(3L, 2L, 1L))
    // exact product in fixed term order: C = 405, cf(spark)=2, cf(join)=1
    def fac(tf: Long, cf: Long, dl: Long): Double =
      (tf * 405L + 2000L * cf).toDouble / (405L * (dl + 2000L)).toDouble
    assert(out.head._3 == fac(1, 2, 2) * fac(1, 1, 2))
    assert(out(1)._3 == fac(0, 2, 2) * fac(0, 1, 2))
    assert(out(2)._3 == fac(1, 2, 401) * fac(0, 1, 401))
  }

  test("rankerCompare (b06): ap_bm25 is b04's AP verbatim; delta and " +
      "sign are exact; QL side graded on the same qrels") {
    import spark.implicits._
    val pad = (1 to 9).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"vector $pad vector vector"),
      (2L, s"zzz $pad vector vector"),
      (3L, s"vector $pad yyy www"),
      (4L, s"aaa $pad bbb ccc")
    ).toDF("doc_id", "text")
    val cmp = Ranking.rankerCompare(docs, terms = Seq("vector"))
      .collect()
    assert(cmp.map(_.getString(0)).toSeq == Seq("vector"))
    val r = cmp.head
    val b04 = Ranking.retrievalEval(docs, terms = Seq("vector"))
      .collect().head
    assert(r.getAs[Long]("n_rel") == b04.getAs[Long]("n_rel"))
    assert(r.getAs[Double]("ap_bm25") == b04.getAs[Double]("ap_at_k"))
    val delta = r.getAs[Double]("delta")
    assert(delta == r.getAs[Double]("ap_ql") - r.getAs[Double]("ap_bm25"))
    assert(r.getAs[Long]("sign") ==
      (if (delta > 0) 1L else if (delta < 0) -1L else 0L))
    // equal dl ⇒ QL orders by tf like BM25 here: same ranking, tie
    assert(r.getAs[Long]("sign") == 0L)
    // and a QL AP computed independently: hits at ranks 1 and 3 of 4
    // retrieved (all docs compete), min(n_rel, k) = 2
    assert(r.getAs[Double]("ap_ql") ==
      (((0.0 + 1.0) + 0.0) + 2.0 / 3.0) / 2.0)
  }

  test("rankerSignificance (b07): K=1 can never be significant; K=4 " +
      "matches an independent full 2^K enumeration") {
    import spark.implicits._
    val pad = (1 to 9).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"vector $pad vector vector"),
      (2L, s"zzz $pad vector vector"),
      (3L, s"vector $pad yyy www"),
      (4L, s"aaa $pad bbb ccc")
    ).toDF("doc_id", "text")
    // one query: flips are {+d, -d}, both as extreme as observed
    val one = Ranking.rankerSignificance(docs, terms = Seq("vector"))
      .collect().head
    assert(one.getAs[Long]("n_queries") == 1L)
    assert(one.getAs[Long]("n_flips") == 2L)
    assert(one.getAs[Double]("p_value") == 1.0)
    assert(!one.getAs[Boolean]("significant"))
    // four queries on the fixture corpus: recompute every assignment
    // independently with the same term-ordered fold
    val fdocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Ranking.rankerSignificance(fdocs).collect().head
    val deltas = Ranking.rankerCompare(fdocs).collect()
      .sortBy(_.getString(0)).map(_.getAs[Double]("delta"))
    val k = deltas.length
    val sumObs = deltas.foldLeft(0.0)(_ + _)
    val meanObs = sumObs / k.toDouble
    val extreme = (0 until (1 << k)).count { m =>
      val s = deltas.zipWithIndex.foldLeft(0.0) { case (a, (d, i)) =>
        a + (if (((m >> i) & 1) == 1) -d else d)
      }
      math.abs(s / k.toDouble) >= math.abs(meanObs)
    }
    assert(out.getAs[Long]("n_queries") == k.toLong)
    assert(out.getAs[Long]("n_flips") == (1L << k))
    assert(out.getAs[Long]("n_extreme") == extreme.toLong)
    assert(out.getAs[Double]("mean_delta") == meanObs)
    assert(out.getAs[Double]("p_value") ==
      extreme.toDouble / (1 << k).toDouble)
  }
}
