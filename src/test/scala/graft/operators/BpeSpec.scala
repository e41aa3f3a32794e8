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

  test("merged symbols stop matching their parts (non-overlap contract)") {
    import spark.implicits._
    // 'aaaa' x3: pairs (a,a)=9 → merge 1 yields 'aa','aa' per word;
    // merge 2 then pairs (aa,aa)=3
    val docs = Seq((0L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 2).collect()
    assert(merges(0).getString(3) == "aa" && merges(0).getLong(4) == 9L)
    assert(merges(1).getString(3) == "aaaa" && merges(1).getLong(4) == 3L)
  }
}
