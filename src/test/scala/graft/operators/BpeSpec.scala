package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The distributed BPE trainer (t38 counting core + bpeTrain merge loop)
  * against a LITERAL single-machine BPE (Sennrich et al. 2016,
  * Algorithm 1) — same tie-break (count desc, then lexicographic pair),
  * same greedy left-to-right non-overlapping merge. */
class BpeSpec extends SparkSpec {

  private def bruteBpe(words: Map[String, Long], nMerges: Int)
      : Seq[(Int, String, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, f) =>
      (w.split("").filter(_.nonEmpty).toVector, f)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var it = 1
    var continue = true
    while (it <= nMerges && continue) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((it, a, b, a + b, c))
        vocab = vocab.map { case (syms, f) =>
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.toVector, f)
        }
        it += 1
      }
    }
    out.toSeq
  }

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (0L, "lower lower lowest newer newer newer wider wide"),
      (1L, "new newer newest low lower slow slower"),
      (2L, "banana bandana cabana banana")
    ).toDF("doc_id", "text")
  }

  private def wordFreqs: Map[String, Long] =
    corpus.collect().flatMap(_.getString(1).split("\\s+"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("bpeTrain matches the literal BPE over 8 merges") {
    val got = TextAnalysis.bpeTrain(corpus, nMerges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    val want = bruteBpe(wordFreqs, 8)
    assert(got == want)
  }

  test("bpePairCounts top pair equals the literal first merge") {
    val top = TextAnalysis.bpePairCounts(corpus, k = 5).head()
    val want = bruteBpe(wordFreqs, 1).head
    assert(top.getAs[String]("pair") == want._2 + want._3)
    assert(top.getAs[Long]("pair_count") == want._5)
  }

  test("bpeEncode replays merges exactly like the greedy fold (t43)") {
    val merges = TextAnalysis.bpeTrain(corpus, nMerges = 8).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextAnalysis.bpeEncode(corpus, merges).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // literal greedy left-to-right non-overlap replay per word
    def encode(w: String): Long = {
      var syms = w.split("").filter(_.nonEmpty).toVector
      for ((a, b) <- merges) {
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            buf += a + b; i += 2
          } else { buf += syms(i); i += 1 }
        }
        syms = buf.toVector
      }
      syms.length.toLong
    }
    val want = corpus.collect().map { row =>
      val toks = row.getString(1).split("\\s+").filter(_.nonEmpty)
      row.getLong(0) -> ((toks.length.toLong,
        toks.map(encode).sum, toks.map(_.length.toLong).sum))
    }.toMap
    assert(got == want)
  }

  test("bpeEncode sentinel spaces pin symbol boundaries") {
    import spark.implicits._
    // tokens: 'abab' merges twice (consecutive-pair replay), 'xab'
    // merges its (a,b) but never a phantom (x,a)·prefix, 'axb' must
    // NOT merge — 'x' splits the pair; 'b' is a 1-char word
    val docs = Seq((0L, "abab xab axb b")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, Seq(("a", "b"))).head()
    assert(out.getAs[Long]("n_tokens") == 4L)
    // abab→[ab,ab]=2, xab→[x,ab]=2, axb→[a,x,b]=3, b→[b]=1
    assert(out.getAs[Long]("n_pieces") == 8L)
    assert(out.getAs[Long]("n_chars") == 11L)
  }

  test("longestMatchPieces (t46): piece-identical to the replay form " +
      "over the driver fixture's trained merges; pieces always " +
      "reassemble each word") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 8).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val lm = TextAnalysis.longestMatchPieces(docs, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // replay pieces from the shared replayedVocab (t43's law)
    val replay = TextAnalysis.replayedVocab(docs, merges)
      .select(col("w"), split(trim(col("s")), "  ").as("pieces"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(lm.keySet == replay.keySet && lm.nonEmpty)
    lm.foreach { case (w, pieces) =>
      assert(pieces == replay(w), s"word '$w': lm=$pieces replay=${replay(w)}")
      assert(pieces.mkString == w, s"pieces don't reassemble '$w'")
    }
  }

  test("longestMatchPieces diverges from replay where maximal munch " +
      "overrides merge order (the documented general non-identity)") {
    import spark.implicits._
    // replay of (a,n),(an,a) segments 'banana' as [b, an, ana] (the
    // FIRST 'an' merged before 'ana' exists); maximal munch grabs
    // 'ana' at position 2 and strands the tail: [b, ana, n, a]. Both
    // reassemble the word — identity holds only when no vocab symbol
    // overlaps a replay boundary, which the driver-fixture test above
    // verifies empirically for its corpus.
    val docs = Seq((0L, "banana")).toDF("doc_id", "text")
    val merges = Seq(("a", "n"), ("an", "a"))
    val lm = TextAnalysis.longestMatchPieces(docs, merges).head()
      .getSeq[String](1).toList
    val replay = TextAnalysis.replayedVocab(docs, merges)
      .select(split(trim(col("s")), "  ")).head().getSeq[String](0).toList
    assert(replay == List("b", "an", "ana"))
    assert(lm == List("b", "ana", "n", "a"))
    assert(lm.mkString == "banana" && replay.mkString == "banana")
  }

  test("longestMatchPieces: maximal munch takes the longest symbol, " +
      "unknown characters fall back to single chars") {
    import spark.implicits._
    // vocab symbols {ab, abc} from merges (a,b), (ab,c): at 'abcx' the
    // walk must take 'abc' (not 'ab'), then unknowns 'x' char-by-char
    val docs = Seq((0L, "abcx qq")).toDF("doc_id", "text")
    val pieces = TextAnalysis.longestMatchPieces(docs,
      Seq(("a", "b"), ("ab", "c"))).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(pieces("abcx") == List("abc", "x"))
    assert(pieces("qq") == List("q", "q"))
    // no merges at all: every word splits to characters
    val none = TextAnalysis.longestMatchPieces(docs, Nil).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(none("abcx") == List("a", "b", "c", "x"))
  }

  test("bpeLongestMatchEncode (t46) equals bpeEncode (t43) row-for-row " +
      "over the driver fixture's trained merges") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 8).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val a = TextAnalysis.bpeEncode(docs, merges).collect()
      .map(_.toSeq).toSeq
    val b = TextAnalysis.bpeLongestMatchEncode(docs, merges).collect()
      .map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("detokenizeRoundTrip (t47): every doc round-trips; a boundary-" +
      "gluing merge list is caught") {
    val merges = TextAnalysis.bpeTrain(corpus, nMerges = 8).collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val rows = TextAnalysis.detokenizeRoundTrip(corpus, merges).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("round_trip_ok"), s"doc ${r.getLong(0)}")
      assert(r.getAs[String]("original_md5") ==
        r.getAs[String]("decoded_md5"))
    }
    // whitespace normalization: padding/multi-space variants of the
    // same tokens round-trip to the SAME digests
    import spark.implicits._
    val messy = Seq((7L, "  lower   lower\tnewer ")).toDF("doc_id", "text")
    val clean = Seq((7L, "lower lower newer")).toDF("doc_id", "text")
    val rm = TextAnalysis.detokenizeRoundTrip(messy, merges).head()
    val rc = TextAnalysis.detokenizeRoundTrip(clean, merges).head()
    assert(rm.getAs[Boolean]("round_trip_ok"))
    assert(rm.getAs[String]("decoded_md5") ==
      rc.getAs[String]("decoded_md5"))
  }

  test("fertilityBySource (t48): per-source totals and both fertility " +
      "ratios read off a crafted two-source corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab ab cd", "s1"),   // ab→[ab]=1, cd→[c,d]=2
      (2L, "abab xy", "s2"),    // abab→[ab,ab]=2, xy→[x,y]=2
      (3L, "ab", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.fertilityBySource(docs, Seq(("a", "b")))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(out("s1") == Seq(1L, 3L, 4L, 6L, 1.5, 4.0 / 3.0))
    assert(out("s2") == Seq(2L, 3L, 5L, 8L, 1.6, 5.0 / 3.0))
  }

  test("merged symbols stop matching their parts (non-overlap contract)") {
    import spark.implicits._
    // 'aaaa' x3: pairs (a,a)=9 → merge 1 yields 'aa','aa' per word;
    // merge 2 then pairs (aa,aa)=3
    val docs = Seq((0L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 2).collect()
    assert(merges(0).getString(3) == "aa" && merges(0).getLong(4) == 9L)
    assert(merges(1).getString(3) == "aaaa" && merges(1).getLong(4) == 3L)
  }

  test("unigramTrain (t50): hand-computed EM outcome — maximal munch " +
      "under the seeded candidates, half-bit costs, char conservation") {
    // words: ababab wf=3, cdcd wf=1. Candidates include abab (len 4);
    // greedy longest-match segments ababab -> [abab, ab] and cdcd ->
    // [cdcd]; usage: abab 3, ab 3, cdcd 1; total 7. Costs: floor(2·
    // log2 7)=5 minus floor(2·log2 3)=3 -> 2; minus floor(2·log2 1)=0
    // -> 5. No single-char fallback fires (full multi-char coverage).
    import spark.implicits._
    val docs = Seq((0L, "ababab ababab"), (1L, "cdcd ababab"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.unigramTrain(docs).collect()
      .map(r => (r.getString(0), r.getAs[Long]("piece_len"),
        r.getAs[Long]("usage"), r.getAs[Long]("total"),
        r.getAs[Long]("cost_half_bits"))).toSet
    assert(rows == Set(("ab", 2L, 3L, 7L, 2L), ("abab", 4L, 3L, 7L, 2L),
      ("cdcd", 4L, 1L, 7L, 5L)))
    // char conservation: a lossless segmentation spends every char
    val spent = rows.toSeq.map(r => r._2 * r._3).sum
    assert(spent == 3L * 6 + 4) // wf-weighted corpus chars
  }

  test("unigramTrain on the fixture corpus: pruned vocab within " +
      "target, costs monotone in usage, chars conserved") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = TextAnalysis.unigramTrain(docs).collect()
    assert(rows.nonEmpty)
    val multi = rows.filter(_.getAs[Long]("piece_len") > 1)
    assert(multi.nonEmpty && multi.length <= 12)
    assert(rows.forall(r => r.getAs[Long]("piece_len") <= 4))
    // cost = floor(2 log2 total) − floor(2 log2 usage) is non-
    // increasing in usage
    val byUsage = rows.sortBy(-_.getAs[Long]("usage"))
      .map(_.getAs[Long]("cost_half_bits"))
    assert(byUsage.sliding(2).forall {
      case Array(a, b) => a <= b; case _ => true })
    // char conservation against an independent token-char count
    import org.apache.spark.sql.functions._
    val chars = graft.operators.Dedup.spread(docs)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .agg(sum(length(col("w"))).as("c")).head().getLong(0)
    val spent = rows.map(r =>
      r.getAs[Long]("piece_len") * r.getAs[Long]("usage")).sum
    assert(spent == chars)
  }

  test("unigramScore (t51): hand-computed doc costs under the t50 " +
      "model, integer keep law, one-division bits_per_piece") {
    import spark.implicits._
    // the t50 hand fixture: model = ab(2), abab(2), cdcd(5), total 7
    val docs = Seq((0L, "ababab ababab"), (1L, "cdcd ababab"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(docs)
    val out = TextAnalysis.unigramScore(docs, model).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_pieces"), r.getAs[Long]("cost_half_bits"),
        r.getAs[Double]("bits_per_piece"), r.getAs[Boolean]("keep")))
    // ababab -> [abab, ab] cost 4; cdcd -> [cdcd] cost 5
    // doc 0: 2 tokens, 4 pieces, cost 8; doc 1: 2 tokens, 3 pieces,
    // cost 9. Totals (17, 7): keep iff cost·7 <= 17·pieces
    assert(out.toSeq == Seq(
      (0L, 2L, 4L, 8L, 8.0 / 8.0, true), // 56 <= 68
      (1L, 2L, 3L, 9L, 9.0 / 6.0, false))) // 63 > 51
  }

  test("unigramScore: OOV pieces take the single-char fallback at the " +
      "unseen-piece cost floor(2·log2 total)") {
    import spark.implicits._
    val train = Seq((0L, "ababab ababab"), (1L, "cdcd ababab"))
      .toDF("doc_id", "text")
    val model = TextAnalysis.unigramTrain(train)
    // 'qq': no model piece matches -> two single-'q' pieces, each
    // charged the usage=1 limit cost floor(2·log2 7) = 5
    val scored = TextAnalysis.unigramScore(
      train.union(Seq((2L, "qq")).toDF("doc_id", "text")), model)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_pieces"),
        r.getAs[Long]("cost_half_bits")))
    val d2 = scored.find(_._1 == 2L).get
    assert(d2 == ((2L, 2L, 10L)))
    // the training docs' per-doc costs are unchanged by the extra doc
    assert(scored.find(_._1 == 0L).get._3 == 8L)
    assert(scored.find(_._1 == 1L).get._3 == 9L)
  }

  test("unigramScore on the fixture corpus: cost conservation against " +
      "the model's own usage ledger") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val model = TextAnalysis.unigramTrain(docs)
    val out = TextAnalysis.unigramScore(docs, model)
    val agg = out.agg(sum(col("cost_half_bits")).as("c"),
      sum(col("n_pieces")).as("p")).head()
    // scoring the training corpus re-walks the training segmentation:
    // Σ doc cost = Σ usage·cost over the model, Σ doc pieces = total
    val ledger = model.agg(
      sum(col("usage") * col("cost_half_bits")).as("c"),
      max(col("total")).as("p")).head()
    assert(agg.getLong(0) == ledger.getLong(0))
    assert(agg.getLong(1) == ledger.getLong(1))
    // the keep set is nonempty and proper (a filter that keeps all or
    // none isn't filtering)
    val keeps = out.groupBy(col("keep")).count().collect()
      .map(r => (r.getBoolean(0), r.getLong(1))).toMap
    assert(keeps.getOrElse(true, 0L) > 0L && keeps.getOrElse(false, 0L) > 0L)
  }
}
