package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary-column plumbing: typed decode path, metadata envelope, frame
  * sampling — with the deterministic stub decoder. */
class MultimodalSpec extends SparkSpec {

  private def assets(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (id, t, content) =>
        MediaAsset(id, t, content.getBytes("UTF-8"))
      }
      .toDS()
  }

  test("extractFeatures runs the decoder per partition with typed encoders") {
    val ds = assets((1L, "image", "abcd"), (2L, "audio", "xy")).repartition(2)
    val feats = Multimodal.extractFeatures(spark, ds).collect()
      .sortBy(_.asset_id)
    assert(feats.map(_.asset_id).toSeq == Seq(1L, 2L))
    val f1 = feats(0)
    assert(f1.n_bytes == 4)
    // mean byte value of "abcd" = (97+98+99+100)/4
    assert(f1.mean_luma == 98.5)
    assert(f1.width % 16 == 0 && f1.width >= 16 && f1.width <= 256)
    assert(f1.height % 9 == 0 && f1.height >= 9 && f1.height <= 144)
  }

  test("stub decode is deterministic (same bytes -> same features)") {
    val a = MediaAsset(7L, "video", "payload".getBytes("UTF-8"))
    assert(Multimodal.StubDecoder.decode(a) == Multimodal.StubDecoder.decode(a))
  }

  test("frameSample slices fixed-size frames and keeps every stride-th") {
    import spark.implicits._
    // 10-byte frames, stride 2, 35-byte payload -> frames 0..3, keep 0 and 2
    val content = ("0123456789" * 3) + "ABCDE"
    val df = Seq((1L, "video", content)).toDF("asset_id", "media_type", "c")
      .select(col("asset_id"), col("media_type"),
        col("c").cast("binary").as("content"))
    val out = Multimodal.frameSample(df, frameBytes = 10, stride = 2)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(0L, 2L))
    // fingerprint = md5 of the HEX of the frame bytes (byte-faithful
    // across engines)
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8").map("%02X".format(_)).mkString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0)._2 == m("0123456789"))
    assert(out(1)._2 == m("0123456789")) // frame 2 = bytes 20-29
    // empty payload -> zero frames, no phantom row
    val empty = Seq((2L, "audio", Array.empty[Byte]))
      .toDF("asset_id", "media_type", "content")
    assert(Multimodal.frameSample(empty).count() == 0)
  }

  test("metadata envelope matches the stub decoder's derivations") {
    import spark.implicits._
    val ds = assets((5L, "image", "hello world"))
    val meta = Multimodal.withMetadata(ds.toDF()).collect().head
    val feats = Multimodal.StubDecoder.decode(
      MediaAsset(5L, "image", "hello world".getBytes("UTF-8")))
    assert(meta.getAs[Long]("n_bytes") == feats.n_bytes)
    assert(meta.getAs[Int]("width") == feats.width)
    assert(meta.getAs[Int]("height") == feats.height)
  }
}

/** Exact payload dedup + the label-inconsistency signal. */
class MediaDedupSpec extends graft.SparkSpec {
  test("media dedup keeps the low id and surfaces conflicting type labels") {
    import spark.implicits._
    val docs = Seq((1L, "same bytes"), (2L, "other bytes"))
      .toDF("doc_id", "text")
    val got = Multimodal.mediaDedup(docs).collect()
      .map(r => r.getAs[Long]("kept_asset_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("n_claimed_types")))
      .toMap
    // every doubled copy (+1000000) shifts its id-derived media type
    // (1000000 % 3 = 1), so each group: 2 copies, 2 claimed types
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((2L, 2L))))
  }

  test("media retrieval: identical payloads rank first with the max score") {
    import spark.implicits._
    // asset 5 is a byte-identical copy of query asset 0 -> identical
    // pseudo-features -> its score is the query's self-dot |f|². NOTE
    // this is a raw (unnormalized) dot, so rank-1 for the copy is NOT
    // structural — a higher-norm non-copy can out-score |f|² in
    // general; it holds DETERMINISTICALLY for these fixed payloads
    // (features are pure digest functions), which is what the
    // assertion pins
    val docs = Seq((0L, "payload alpha"), (1L, "payload beta"),
      (2L, "payload gamma"), (3L, "payload delta"), (4L, "payload eps"),
      (5L, "payload alpha")).toDF("doc_id", "text")
    val rows = Multimodal.mediaRetrieval(docs).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == (0L until 5L).toSet)
    for ((q, rs) <- byQuery) {
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length))
      assert(sorted.forall(_.getAs[Long]("neighbor_id") != q))
      // scores descend and are non-negative (digit values are 0..15)
      val s = sorted.map(_.getAs[Long]("score"))
      assert(s.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      })
      assert(s.forall(_ >= 0L))
    }
    val q0 = byQuery(0L).sortBy(_.getAs[Long]("rank"))
    assert(q0.head.getAs[Long]("neighbor_id") == 5L)
    // determinism: a second run returns byte-identical rows
    val again = Multimodal.mediaRetrieval(docs).collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }
}

/** Proves the m04 decoder swap seam: a toy REAL decoder (reads actual
  * payload bytes, not a digest) plugs into `mediaRetrieval` through the
  * one `featurize` select, yields different embeddings, and leaves the
  * physical retrieval plan shape untouched. */
class MediaRetrievalSeamSpec extends graft.SparkSpec {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

  /** Toy real decoder: the first 64 PAYLOAD BYTES as float dims (hex
    * pairs, zero-padded past end-of-payload) — trivial, but it decodes
    * the bytes themselves, which the digest stub never does. */
  private def byteFeatures(assets: DataFrame): DataFrame =
    assets.withColumn("hx", hex(col("content")))
      .select(col("asset_id").as("vec_id"), col("media_type"),
        expr("transform(sequence(1, 64), i -> CAST(coalesce(" +
          "conv(nullif(substr(hx, 2*i - 1, 2), ''), 16, 10), '0')" +
          " AS FLOAT))").as("features"))

  private def docs = {
    import spark.implicits._
    Seq((0L, "payload alpha"), (1L, "payload beta"), (2L, "payload gamma"),
      (3L, "payload delta"), (4L, "payload eps"), (5L, "payload alpha"),
      (6L, "another body"), (7L, "yet another"))
      .toDF("doc_id", "text")
  }

  /** Multiset of structural physical nodes (joins/aggregates/exchanges)
    * after AQE unwrap — the retrieval plan's shape signature. */
  private def shape(df: DataFrame): Map[String, Int] = {
    val top = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def walk(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children ++ p.subqueries).flatMap(walk)
    walk(top).map(_.getClass.getSimpleName)
      .filter(n => n.contains("Join") || n.contains("Aggregate") ||
        n.contains("Exchange"))
      .groupBy(identity).map { case (k, v) => k -> v.size }
  }

  test("toy byte decoder swaps through the one featurize seam") {
    val stub = Multimodal.mediaRetrieval(docs)
    val toy = Multimodal.mediaRetrieval(docs,
      featurize = byteFeatures)
    assert(toy.schema == stub.schema)
    val stubRows = stub.collect().map(_.toString).toSeq
    val toyRows = toy.collect().map(_.toString).toSeq
    // different embeddings -> different scores somewhere
    assert(stubRows != toyRows)
    // ...and the byte-identical copy (asset 5 = asset 0's payload) scores
    // exactly the query's self-dot under the toy decoder: sum of squared
    // payload byte values — the real bytes went through the real seam.
    // (Rank-1 for the copy is NOT asserted here: raw-dot scores of
    // correlated byte features can legitimately out-score |f|².)
    val copyScore = toy.collect()
      .find(r => r.getAs[Long]("query_id") == 0L &&
        r.getAs[Long]("neighbor_id") == 5L).get.getAs[Long]("score")
    val wantDot = "payload alpha".getBytes("UTF-8")
      .map(b => (b & 0xff).toLong * (b & 0xff)).sum
    assert(copyScore == wantDot)
    // the featurizers genuinely disagree on the same asset
    val sf = Multimodal.digestFeatures(Multimodal.assetsFrom(docs))
      .filter(col("vec_id") === 0L).select("features")
      .collect().head.getSeq[Float](0)
    val bf = byteFeatures(Multimodal.assetsFrom(docs))
      .filter(col("vec_id") === 0L).select("features")
      .collect().head.getSeq[Float](0)
    assert(sf != bf)
    // "p" = 0x70 = 112: the toy decoder really read the payload byte
    assert(bf.head == 112.0f)
    // identical physical plan shape: same join/aggregate/exchange nodes
    assert(shape(toy) == shape(stub))
  }
}

/** m05: blockhash signature semantics + banded perceptual near-dup. */
class PerceptualDedupSpec extends graft.SparkSpec {

  test("BlockBitsUtil: strict mean compare, short payloads, empty") {
    import graft.functions.BlockBitsUtil
    def bits(bs: Array[Int], n: Int): String =
      BlockBitsUtil.compute(bs.map(_.toByte), n).toString
    // blocks [0, 0, 255, 255], total 510: only the high blocks set
    assert(bits(Array(0, 0, 255, 255), 4) == "0011")
    // uniform payload: no block STRICTLY exceeds the global mean
    assert(bits(Array.fill(8)(7), 4) == "0000")
    // shorter than nBlocks: empty blocks read '0'; the lone byte's
    // block doesn't strictly beat its own mean either
    assert(bits(Array(10), 4) == "0000")
    // empty payload: all-'0' signature, no division anywhere
    assert(bits(Array.empty[Int], 4) == "0000")
    // one hot region among zeros: exactly that block set
    assert(bits(Array(0, 0, 0, 0, 0, 0, 200, 200), 4) == "0001")
  }

  test("BlockBitsUtil.exceeds: exact 128-bit compare agrees with " +
      "BigInteger on Long-overflowing cross-products") {
    import graft.functions.BlockBitsUtil
    def oracle(a: Long, b: Long, c: Long, d: Long): Boolean = {
      import java.math.BigInteger.valueOf
      valueOf(a).multiply(valueOf(b))
        .compareTo(valueOf(c).multiply(valueOf(d))) > 0
    }
    // the naive Long compare wraps on all of these (255-byte means over
    // multi-hundred-MB payloads: sums ~255n, n ~2e8 -> products ~1e19)
    val cases = Seq(
      (255L * 200000000L, 200000000L, 255L * 200000000L, 199999999L),
      (255L * 200000000L, 200000000L, 255L * 200000000L, 200000000L),
      (Long.MaxValue / 3, 5L, Long.MaxValue / 5, 7L),
      (1L << 62, 4L, (1L << 62) - 1L, 4L),
      (0L, 123456789L, 1L, 1L),
      (7L, 8L, 8L, 7L))
    cases.foreach { case (a, b, c, d) =>
      assert(BlockBitsUtil.exceeds(a, b, c, d) == oracle(a, b, c, d),
        s"($a,$b,$c,$d)")
      assert(BlockBitsUtil.exceeds(c, d, a, b) == oracle(c, d, a, b),
        s"($c,$d,$a,$b)")
    }
    // deterministic pseudo-random sweep across magnitudes
    var seed = 0x9e3779b97f4a7c15L
    def next(bound: Long): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      java.lang.Long.remainderUnsigned(seed, bound)
    }
    (1 to 2000).foreach { _ =>
      val a = next(255L * 300000000L); val b = next(300000000L)
      val c = next(255L * 300000000L); val d = next(300000000L)
      assert(BlockBitsUtil.exceeds(a, b, c, d) == oracle(a, b, c, d),
        s"($a,$b,$c,$d)")
    }
  }

  test("perceptualDedup: near-identical payloads pair at small " +
      "Hamming; band-colliding far payloads are verified away; " +
      "identity-free payloads pair nothing") {
    import spark.implicits._
    // 512-byte payloads = 64 blocks of 8 bytes; a block of 'z' reads
    // above the global mean ('1'), a block of 'a' below ('0'). P is an
    // IRREGULAR 16-bit band pattern (the striped filter must keep it).
    val P = "0010110011100101"
    val comp = P.map(c => if (c == '1') '0' else '1')
    def payload(bands: Seq[String]): String =
      bands.flatMap(_.map(c => (if (c == '1') "z" else "a") * 8)).mkString
    val doc0 = payload(Seq(P, P, P, P))
    // two blocks flipped in band 3 only: bands 0-2 still collide, full
    // Hamming is exactly 2 — the near-dup survives the verify step
    val doc1 = payload(Seq(P, P, P, "11" + P.drop(2)))
    // band 0 identical (candidate!) but bands 1-3 complemented:
    // Hamming 48 — the verify step must drop it
    val doc2 = payload(Seq(P, comp, comp, comp))
    // uniform payload: all-'0' signature, every band striped — the
    // identity-free filter removes it from the index entirely
    val blank = "u" * 512
    val docs = Seq((0L, doc0), (1L, doc1), (2L, doc2), (3L, blank))
      .toDF("doc_id", "text")
    val out = Multimodal.perceptualDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.contains((0L, 1L)))
    assert(out((0L, 1L)) == 2L)
    assert(!out.contains((0L, 2L)) && !out.contains((1L, 2L)))
    assert(!out.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("perceptualDedup: the posting cap drops an over-dense bucket " +
      "and only that bucket") {
    import spark.implicits._
    val P = "0010110011100101"
    def payload(bands: Seq[String]): String =
      bands.flatMap(_.map(c => (if (c == '1') "z" else "a") * 8)).mkString
    // 5 byte-identical payloads share every band; with the cap at 3
    // every shared bucket is over-dense, so no candidates survive;
    // with the default cap they pair exhaustively (Hamming 0)
    val docs = (0L until 5L).map(i => (i, payload(Seq(P, P, P, P))))
      .toDF("doc_id", "text")
    assert(Multimodal.perceptualDedup(docs,
      maxBucket = Some(3)).count() == 0L)
    assert(Multimodal.perceptualDedup(docs).count() == 10L)
    assert(Multimodal.perceptualDedup(docs, maxBucket = None)
      .count() == 10L)
  }

  test("perceptualDedup finds pairs on the fixture and stays " +
      "band-candidate-bounded") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.perceptualDedup(docs)
    assert(out.count() > 0)
    assert(out.columns.toSeq ==
      Seq("asset_id_a", "asset_id_b", "hamming"))
  }

  test("packed-word hamming is bitwise the string-HOF hamming " +
      "(r21: the codegen'd verify must not change a single distance)") {
    import org.apache.spark.sql.functions._
    // recompute every reported pair's hamming with the ORIGINAL
    // 64-lambda substr fold over the raw signatures and compare
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.perceptualDedup(docs, maxHamming = 64)
    val sigs = Multimodal.assetsFrom(docs).select(col("asset_id"),
      graft.functions.BlockFns.blockBits(col("content"), 64).as("sig"))
    val viaHof = out
      .join(sigs.select(col("asset_id").as("asset_id_a"),
        col("sig").as("sig_a")), "asset_id_a")
      .join(sigs.select(col("asset_id").as("asset_id_b"),
        col("sig").as("sig_b")), "asset_id_b")
      .withColumn("hof", expr(
        "CAST(size(filter(sequence(1, 64), i -> " +
          "substr(sig_a, i, 1) <> substr(sig_b, i, 1))) AS BIGINT)"))
    assert(viaHof.filter(col("hof") =!= col("hamming")).count() == 0L)
    assert(viaHof.count() > 0L)
  }
}

/** m08: modality-aware sequence packing manifest. */
class MultimodalPackingSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._

  test("multimodalPacking: per-modality cost laws, conservation, and " +
      "the p06 straddler bound") {
    import spark.implicits._
    // text "a b c" = 3 tokens, 5 bytes → image 576, audio (5·40)÷80=2,
    // video ceil(5/256)·64 = 64
    val docs = (0L until 30L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val out = Multimodal.multimodalPacking(docs, seqTokens = 700L)
      .collect()
    // conservation: every item lands in exactly one sequence
    assert(out.map(_.getAs[Long]("n_items")).sum == 30L)
    val (nImg, nAud, nVid) = (out.map(_.getAs[Long]("n_image")).sum,
      out.map(_.getAs[Long]("n_audio")).sum,
      out.map(_.getAs[Long]("n_video")).sum)
    assert((nImg, nAud, nVid) == ((10L, 10L, 10L)))
    // cost laws: text 3/doc; media 576/2/64 by modality
    assert(out.map(_.getAs[Long]("text_tokens")).sum == 90L)
    assert(out.map(_.getAs[Long]("media_tokens")).sum ==
      10L * 576 + 10L * 2 + 10L * 64)
    out.foreach { r =>
      assert(r.getAs[Long]("total_tokens") ==
        r.getAs[Long]("text_tokens") + r.getAs[Long]("media_tokens"))
      assert(r.getAs[Long]("n_items") == r.getAs[Long]("n_image") +
        r.getAs[Long]("n_audio") + r.getAs[Long]("n_video"))
    }
    // p06 straddler bound: a sequence overflows by at most ONE item
    // (max item cost here = 3 + 576)
    out.foreach { r =>
      assert(r.getAs[Long]("total_tokens") <= 700L + 579L, r.toString) }
    // determinism: rerun under different partitioning is identical
    val again = Multimodal
      .multimodalPacking(docs.repartition(7), seqTokens = 700L).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}

/** m06: sampled-frame signature Jaccard over the video slice. */
class VideoFrameDedupSpec extends graft.SparkSpec {

  test("videoFrameDedup: exact copy scores 1.0; appended-outro copy " +
      "shares the sampled prefix set; blank-only videos pair nothing") {
    import spark.implicits._
    // doc 2 (a video: 2 % 3 = 2): two 128-byte frames — only frame 0
    // is sampled at stride 2, so the +6M outro (reverse of the first
    // 128 bytes) lands ON the stride grid (idx 2) and becomes visible.
    // f0 is deliberately ASYMMETRIC (32/96) so its reverse is a
    // different signature from both f0 and g0.
    val f0 = "a" * 32 + "z" * 96
    val f1 = "m" * 128
    // doc 5: different split point and alphabet — the two video
    // families (and their reversed outros) never share a signature
    val g0 = "m" * 64 + "q" * 64
    // doc 8: uniform payload — every sampled frame is BLANK (all-'0'
    // signature), so the blank filter removes it from the index
    // entirely: no pairs, not even with its byte-identical +3M copy
    val docs = Seq((2L, f0 + f1), (5L, g0 + f1), (8L, "u" * 256))
      .toDF("doc_id", "text")
    val rows = Multimodal.videoFrameDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // byte-identical re-upload: one sampled sig each, fully shared
    assert(rows((2L, 3000002L)) == ((1L, 1L, 1L, 1.0)))
    assert(rows((5L, 3000005L)) == ((1L, 1L, 1L, 1.0)))
    // outro copy: shares frame 0's sig, adds the reversed-opening sig
    // -> J = 1/2, exactly at the 50% keep threshold
    assert(rows((2L, 6000002L)) == ((1L, 1L, 2L, 0.5)))
    assert(rows((3000002L, 6000002L)) == ((1L, 1L, 2L, 0.5)))
    assert(rows((5L, 6000005L)) == ((1L, 1L, 2L, 0.5)))
    // blank-only family reports nothing; families never cross-pair
    assert(!rows.keySet.exists { case (a, b) =>
      a % 1000000 == 8 || b % 1000000 == 8 })
    assert(!rows.keySet.exists { case (a, b) =>
      a % 1000000 != b % 1000000 })
  }

  test("videoFrameDedup fires on the fixture; every kept pair clears " +
      "the exact integer threshold") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.videoFrameDedup(docs)
    assert(out.columns.toSeq == Seq("video_a", "video_b", "n_common",
      "n_a", "n_b", "jaccard"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, a, b) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c * 100 >= (a + b - c) * 50)
    }
  }
}

/** m07: set-vs-sequence similarity — the re-edit detector. */
class SequenceDedupSpec extends graft.SparkSpec {

  test("sequenceDedup: exact copy 1/1; frame-boundary recut keeps the " +
      "set score and halves the sequence score; one-blank shingles " +
      "keep order info") {
    import spark.implicits._
    // doc 2: four frames with DISTINCT block patterns (blockbits sees
    // patterns, not byte values — 'a/z half-half' and 'm/q half-half'
    // would collide); 512 chars -> the +9M recut rotates at mid=256:
    // [s2,s3,s0,s1], set preserved, shingles {s2|s3, s3|s0, s0|s1}
    val f0 = "a" * 32 + "z" * 96
    val f1 = "a" * 64 + "z" * 64
    val f2 = "a" * 96 + "z" * 32
    val f3 = "z" * 32 + "a" * 96
    // doc 5: distinct patterns + a BLANK middle frame; 384 chars ->
    // mid=128: orig [s4, blank, s5] vs recut [blank, s5, s4]
    val f4 = "m" * 16 + "q" * 112
    val f5 = "q" * 112 + "m" * 16
    val docs = Seq((2L, f0 + f1 + f2 + f3), (5L, f4 + "u" * 128 + f5))
      .toDF("doc_id", "text")
    val rows = Multimodal.sequenceDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("set_jaccard"), r.getAs[Double]("seq_jaccard")))
      .toMap
    assert(rows((2L, 3000002L)) == ((1.0, 1.0)))
    assert(rows((2L, 9000002L)) == ((1.0, 0.5)))
    assert(rows((3000002L, 9000002L)) == ((1.0, 0.5)))
    assert(rows((5L, 3000005L)) == ((1.0, 1.0)))
    // blank-middle doc: shingles {s4|b, b|s5} vs {b|s5, s5|s4} ->
    // seq-J = 1/3 while the (blank-filtered) set still matches fully
    assert(rows((5L, 9000005L)) == ((1.0, 1.0 / 3.0)))
    assert(rows((3000005L, 9000005L)) == ((1.0, 1.0 / 3.0)))
    // families never cross-pair (no shared non-blank signatures)
    assert(!rows.keySet.exists { case (a, b) =>
      a % 1000000 != b % 1000000 })
  }

  test("sequenceDedup on the fixture: exact copies sequence-match; " +
      "every pair clears the set threshold") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Multimodal.sequenceDedup(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, a, b) = (r.getAs[Long]("set_common"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(c * 100 >= (a + b - c) * 50)
      val sj = r.getAs[Double]("seq_jaccard")
      assert(sj >= 0.0 && sj <= 1.0)
    }
    // the byte-identical +3M family must sequence-match at exactly 1.0
    // whenever it has any shingles at all
    val copies = rows.filter(r => r.getAs[Long]("video_b") ==
      r.getAs[Long]("video_a") + 3000000L)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      if (r.getAs[Long]("sh_a") > 0L)
        assert(r.getAs[Double]("seq_jaccard") == 1.0)
    }
  }
}

/** Stub resize plumbing. */
class ResizeSpec extends graft.SparkSpec {
  test("resize downsamples payload bytes deterministically") {
    import spark.implicits._
    val ds = Seq(MediaAsset(1L, "image", "abcdefgh".getBytes("UTF-8"))).toDS()
    val out = Multimodal.resize(spark, ds, factor = 2).collect().head
    assert(new String(out.content, "UTF-8") == "aceg")
    assert(out.asset_id == 1L && out.media_type == "image")
    // composing two factor-2 resizes keeps every 4th original byte
    val again = Multimodal.resize(spark,
      Multimodal.resize(spark, ds, 2), 2).collect().head
    assert(new String(again.content, "UTF-8") == "ae")
  }
}
