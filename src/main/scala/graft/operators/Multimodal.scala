package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset: opaque bytes + typed envelope — the schema pattern for
  * image/audio/video columns at 100 TB (binary payload column, narrow
  * typed metadata beside it, so metadata-only queries never touch the
  * payload bytes thanks to parquet column pruning). */
case class MediaAsset(asset_id: Long, media_type: String,
    content: Array[Byte])

/** Decoded-media features (what a real decoder would emit). */
case class MediaFeatures(asset_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, mean_luma: Double)

/** Multimodal-column operators: opaque `binary` payloads with typed
  * metadata, decode / feature-extract / frame-sample.
  *
  * The actual pixel/sample decode is STUBBED (this environment ships no
  * image/audio codecs): [[StubDecoder]] derives deterministic fake
  * features from the bytes. Everything AROUND the stub — the binary
  * schema, the typed `Dataset[MediaAsset]` encoder plumbing, the
  * per-partition batch iteration, the frame-slicing layout, partition
  * behavior — is real and tested; swapping in a codec changes one
  * function.
  */
object Multimodal {

  /** Deterministic fixture assets derived from the documents fixture: the
    * UTF-8 bytes of `text` stand in for an encoded media payload. */
  def assetsFrom(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("content"))

  /** Typed metadata envelope computed WITHOUT decoding: byte length,
    * content digest, and (stub) dimensions/duration derived from the
    * digest — pure column expressions over the binary column. */
  def withMetadata(assets: DataFrame): DataFrame = {
    val m = md5(col("content"))
    assets
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      .withColumn("content_md5", m)
      .withColumn("width",
        (lit(16) * (locateHex(substring(m, 1, 1)) + 1)).cast("int"))
      .withColumn("height",
        (lit(9) * (locateHex(substring(m, 2, 1)) + 1)).cast("int"))
      .withColumn("duration_ms", (col("n_bytes") * 40).cast("long"))
      .withColumn("n_frames",
        ceil(col("n_bytes").cast("double") / 256.0).cast("long"))
  }

  /** 0-based value of one hex digit (codegen'd builtins only). */
  private def locateHex(c: org.apache.spark.sql.Column) =
    call_function("locate", c, lit("0123456789abcdef")) - 1

  /** STUB decode: deterministic fake features from raw bytes — byte count,
    * digest-derived dimensions, mean byte value as "mean luma". A real
    * deployment replaces this body with an actual codec call; signature
    * and call sites stay identical. */
  object StubDecoder extends Serializable {
    def decode(a: MediaAsset): MediaFeatures = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(a.content)
      val hex = digest.map("%02x".format(_)).mkString
      MediaFeatures(
        asset_id = a.asset_id,
        media_type = a.media_type,
        n_bytes = a.content.length.toLong,
        width = 16 * (Integer.parseInt(hex.substring(0, 1), 16) + 1),
        height = 9 * (Integer.parseInt(hex.substring(1, 2), 16) + 1),
        mean_luma =
          if (a.content.isEmpty) 0.0
          else a.content.map(b => (b & 0xff).toDouble).sum / a.content.length)
    }
  }

  /** Per-partition feature extraction over the typed Dataset — the Scala
    * analogue of a `mapInPandas` decode UDF: one decoder instance per
    * partition, batch iteration, typed output encoder. This is where a
    * real codec would run, colocated with the data. */
  def extractFeatures(spark: SparkSession,
      assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      val decoder = StubDecoder // per-partition init (codec handle, model…)
      it.map(decoder.decode)
    }
  }

  /** STUB resize: deterministic downsample of the payload — keep every
    * `factor`-th byte and scale the envelope dimensions. A real codec
    * resizes pixels; the pipeline shape (typed in/out, per-partition
    * batches, payload + envelope travelling together) is identical. */
  def resize(spark: SparkSession, assets: Dataset[MediaAsset],
      factor: Int = 2): Dataset[MediaAsset] = {
    import spark.implicits._
    require(factor > 0, "factor must be positive")
    assets.mapPartitions(_.map { a =>
      val down = a.content.zipWithIndex.collect {
        case (b, i) if i % factor == 0 => b
      }
      a.copy(content = down)
    })
  }

  /** Frame sampling as a relational op: slice the payload into fixed-size
    * frames, keep every `stride`-th, fingerprint each — explode/filter/
    * project, all codegen'd, no decode required. */
  def frameSample(assets: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    assets
      .withColumn("n_frames",
        ceil(octet_length(col("content")).cast("double") / frameBytes)
          .cast("long"))
      // empty payload -> 0 frames -> no rows (a bare sequence(0, -1)
      // would produce the DESCENDING sequence [0, -1], a phantom frame)
      .select(col("asset_id"), col("media_type"), col("content"),
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      // fingerprint the HEX of the slice: hex is byte-faithful in every
      // engine (oracle: slice hex text at 2x offsets), where raw-text
      // slicing would be characters-vs-bytes for non-ASCII payloads
      .select(col("asset_id"), col("media_type"), col("frame_idx"),
        md5(hex(col("content").substr(
          (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)))).as("frame_md5"))
      .orderBy(col("asset_id"), col("frame_idx"))

  /** Oracle-checked metadata query: envelope of every fixture asset. */
  def mediaMetadata(documents: DataFrame): DataFrame =
    withMetadata(assetsFrom(documents))
      .select(col("asset_id"), col("media_type"), col("n_bytes"),
        col("content_md5"), col("width"), col("height"),
        col("duration_ms"), col("n_frames"))
      .orderBy(col("asset_id"))

  /** m03: exact media dedup by PAYLOAD digest — the multimodal face of
    * d01 (text dedup dedups what the bytes SAY; this dedups what the
    * bytes ARE: the same encoded asset re-uploaded, re-crawled, or
    * re-labeled). Groups by md5 of the binary payload, keeps the lowest
    * asset id, and counts DISTINCT CLAIMED MEDIA TYPES per group — the
    * same bytes filed once as image and once as video is a label-
    * inconsistency signal dedup gets for free here, and exactly what a
    * crawler dedup stage wants to surface before a mislabeled copy
    * routes to the wrong decode pipeline.
    *
    * The doubled fixture (ids +1000000) shifts every copy's id-derived
    * type label (1000000 % 3 = 1), so each group carries 2 claimed
    * types by construction — the oracle sees the signal, not zeros.
    *
    * Scale: d01's shape exactly — one digest shuffle with map-side
    * partial agg; the payload column never crosses the wire (the digest
    * is computed in the scan stage, then pruned). */
  def mediaDedup(documents: DataFrame): DataFrame =
    assetsFrom(Dedup.doubledCorpus(documents))
      .select(col("asset_id"), col("media_type"),
        md5(col("content")).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("asset_id")).as("kept_asset_id"),
        count(lit(1)).as("n_copies"),
        countDistinct(col("media_type")).as("n_claimed_types"))
      .select(col("kept_asset_id"), col("content_md5"), col("n_copies"),
        col("n_claimed_types"))
      .orderBy(col("kept_asset_id"))

  /** m05: PERCEPTUAL near-dup pairs over the binary payload — the
    * multimodal face of d05/d06: m03 catches byte-identical
    * re-uploads, this catches the re-encoded/lightly-edited copy whose
    * bytes differ but whose CONTENT distribution doesn't. Signature is
    * the classic blockhash ([[graft.functions.BlockBits]], one
    * codegen'd pass per payload: 64 region-mean-vs-global-mean bits,
    * exact cross-multiplied integer compares); candidate generation is
    * banded exactly like SimHash/MinHash-LSH (4 bands × 16 bits —
    * equal-band exact match), and the verify step re-checks the full
    * 64-bit Hamming distance, so banding only costs recall (a pair
    * differing in all 4 bands is missed — the standard LSH trade),
    * never precision.
    *
    * Honest stub note: a real deployment computes the signature over
    * DECODED luma pixels; with no codecs in this rig the payload
    * bytes stand in for the pixel plane (the [[StubDecoder]]
    * discipline — swapping in a decoder changes the expression input,
    * not the banding/verify plan).
    *
    * Scale: one scan-stage signature pass (payload pruned after), one
    * (band, value)-keyed self-join — the d04 banded shape, quadratic
    * ONLY within a bucket — with BOTH bucket-degeneration guards
    * applied (not merely named):
    *  - IDENTITY-FREE BAND FILTER (m06's blank-frame fix, taken to
    *    the band level): a band value that is all-'0', all-'1', or a
    *    period-2 stripe ('0101…'/'1010…') carries ≤ 2 bits of
    *    identity — it is the signature of uniform or
    *    uniformly-alternating texture (the band analogue of a blank
    *    frame), and the sf0.1 bucket audit shows exactly these values
    *    as the corpus's hottest keys (top bucket '1010…' = 3.1% of
    *    all candidate pairs). Matching on them is noise, so dropping
    *    the POSTING (the payload keeps its other bands) is a semantic
    *    fix, not a recall loss. An all-'0' whole signature (blank
    *    payload, every band striped) consequently generates no
    *    candidates at all — the correct answer for an identity-free
    *    input. (All-'1' signatures cannot occur: every block mean
    *    strictly above the weighted global mean is a contradiction.)
    *  - POSTING CAP (d11's lossy escape): a (band, value) bucket
    *    larger than `maxBucket` (default 256) is dropped from
    *    candidate generation entirely, bounding per-bucket
    *    enumeration at cap²/2 pairs so TOTAL candidate volume is
    *    linear in corpus size at any scale. RECALL COST: a pair whose
    *    every agreeing band is a dropped bucket is missed — by
    *    construction such pairs share 16 signature bits with ≥cap
    *    other payloads, i.e. boilerplate/filler density where
    *    enumeration is Θ(cap²) for near-zero identity. The cap never
    *    binds on the oracle fixtures (max bucket: 4 at sf0.01, 19 at
    *    sf0.1 — exactness is untouched where the oracle checks); pass
    *    `maxBucket = None` for exact banding.
    * The verify filter is two xor+bit_count words per surviving
    * candidate (whole-stage codegen; r21 — the interpreted 64-lambda
    * substr fold it replaces priced the ×64 stress at 53×).
    *
    * Threshold: 16/64 bits. MEASURED on the fixtures (post-filter):
    * text payloads move more block means per edit than re-encoded
    * pixels would, so the classic image threshold (≤10) is too tight
    * here; 16 keeps the operator selective (1605 of 8283 candidates
    * at sf0.1) while actually firing on this corpus. */
  def perceptualDedup(documents: DataFrame, nBlocks: Int = 64,
      bandBits: Int = 16, maxHamming: Int = 16,
      maxBucket: Option[Int] = Some(256)): DataFrame = {
    require(nBlocks % bandBits == 0, "bandBits must divide nBlocks")
    require(nBlocks % 32 == 0, "signature packs into 32-bit words")
    val nBands = nBlocks / bandBits
    // the signature ALSO packs into 32-bit words ONCE per asset (conv
    // is codegen'd; values < 2^32 are exact in a long), so the
    // per-pair verify downstream is pure xor+bit_count arithmetic —
    // the r20-named lever for the ×64 reading: the interpreted
    // 64-lambda substr HOF ran per band-duplicated CANDIDATE, pricing
    // the verify at candidate volume × interpreter dispatch, and the
    // wide 64-char signature strings rode every exchange. Words are
    // bitwise-faithful to the string (spec: hamming equality vs the
    // HOF form), so results are unchanged.
    val nWords = nBlocks / 32
    val wordCols = (0 until nWords).map(w => conv(
      substring(col("sig"), w * 32 + 1, 32), 2, 10).cast("long")
      .as(s"w$w"))
    val sigs = assetsFrom(documents).select(col("asset_id"),
      graft.functions.BlockFns.blockBits(col("content"), nBlocks)
        .as("sig"))
      .select(col("asset_id") +: col("sig") +: wordCols: _*)
    // identity-free band values: constant or period-2 striped bits
    // (≤ 2 bits of identity — the band-level blank frame; see scaladoc)
    val striped = Seq("0", "1", "01", "10")
      .map(p => (p * bandBits).take(bandBits))
    val wordNames = (0 until nWords).map(w => s"w$w")
    val allBands = sigs
      .select(col("asset_id") +: col("sig") +:
        explode(sequence(lit(0), lit(nBands - 1))).as("band") +:
        wordNames.map(col): _*)
      .withColumn("band_val", col("sig").substr(
        col("band") * bandBits + 1, lit(bandBits)))
      .filter(!col("band_val").isin(striped: _*))
    // the cap rides the SAME (band, band_val) exchange the self-join
    // needs: a whole-partition window count + filter, no second
    // aggregate and no anti-join (measured: the groupBy+anti form
    // doubled m05's wall time at sf0.1)
    val bands = maxBucket match {
      case None => allBands
      case Some(cap) =>
        allBands.withColumn("_df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("band_val"))))
          .filter(col("_df") <= cap)
          .select(col("asset_id") +: col("band") +:
            col("band_val") +: wordNames.map(col): _*)
    }
    // pairs carry the packed words (2×8 bytes vs the 64-char string):
    // a narrower exchange into the dedup, and the verify below is a
    // whole-stage-codegen xor+bit_count per word — ~4 ALU ops per
    // candidate where the HOF form paid 64 interpreted lambda calls
    val l = bands.select(col("band") +: col("band_val") +:
      col("asset_id").as("asset_id_a") +:
      wordNames.map(n => col(n).as(s"${n}_a")): _*)
    val r = bands.select(col("band") +: col("band_val") +:
      col("asset_id").as("asset_id_b") +:
      wordNames.map(n => col(n).as(s"${n}_b")): _*)
    val hamming = wordNames
      .map(n => bit_count(col(s"${n}_a").bitwiseXOR(col(s"${n}_b")))
        .cast("long"))
      .reduce(_ + _)
    l.join(r, Seq("band", "band_val"))
      .filter(col("asset_id_a") < col("asset_id_b"))
      .select(col("asset_id_a") +: col("asset_id_b") +:
        wordNames.flatMap(n => Seq(col(s"${n}_a"), col(s"${n}_b"))): _*)
      .distinct()
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_id_a"), col("asset_id_b"), col("hamming"))
      .orderBy(col("asset_id_a"), col("asset_id_b"))
  }

  /** m08: MODALITY-AWARE SEQUENCE PACKING — the multimodal face of
    * p06's packing manifest (the MM1/Chameleon/Flamingo intake shape:
    * interleaved documents where the text and the attached media both
    * spend the sequence's token budget, and media spends it by a
    * MODALITY LAW, not by byte count). Each document is one multimodal
    * item: its text token count plus its attachment's cost —
    * image = 576 (the ViT-L/14@336 patch budget), audio =
    * duration_ms ÷ 80 (a 12.5-token/s codec rate), video =
    * n_frames × 64 (64 patch-tokens per sampled frame) — all read off
    * [[withMetadata]]'s envelope, so swapping the decode stub for real
    * codecs changes the ENVELOPE inputs, never the packing law. Items
    * pack with p06's exact discipline (md5-shard, shuffle-key order,
    * running-sum prefix division — the deterministic permutation IS
    * the training order) and the output is the per-sequence manifest:
    * item/modality counts and the text/media/total token spend.
    *
    * Token arithmetic is all exact integers (one multiply + one floor
    * div per row); the only per-sequence law is the p06 cumulative
    * window.
    *
    * Scale: one scan computes every cost column (codegen, payload
    * pruned at the projection); the pack is p06's shard-parallel
    * running sum (16-way here, widen the shard prefix at scale exactly
    * as [[Sampling.packSequences]] documents); the manifest is one
    * (shard, seq)-keyed partial agg. */
  def multimodalPacking(documents: DataFrame,
      seqTokens: Long = 2048L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val meta = withMetadata(assetsFrom(documents))
      .select(col("asset_id").as("doc_id"), col("media_type"),
        col("duration_ms"), col("n_frames"))
    val items = documents.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long")
          .as("text_tokens"))
      .join(meta, "doc_id")
      .withColumn("media_tokens",
        when(col("media_type") === "image", lit(576L))
          .when(col("media_type") === "audio",
            expr("duration_ms div 80"))
          .otherwise(col("n_frames") * 64L))
      .withColumn("item_tokens",
        col("text_tokens") + col("media_tokens"))
    val key = Sampling.sampleKey(col("doc_id"))
    val base = items
      .withColumn("shard", substring(key, 1, 1))
      .withColumn("shuffle_key", key)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before",
        coalesce(sum(col("item_tokens")).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before div $seqTokens"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(when(col("media_type") === "image", 1L).otherwise(0L))
          .as("n_image"),
        sum(when(col("media_type") === "audio", 1L).otherwise(0L))
          .as("n_audio"),
        sum(when(col("media_type") === "video", 1L).otherwise(0L))
          .as("n_video"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("media_tokens")).as("media_tokens"),
        sum(col("item_tokens")).as("total_tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** m04: cross-modal retrieval WIRING — binary payload → (stub)
    * feature extraction → the audited ANN path. The feature extractor
    * is the honest decode stub this rig allows (no codecs): a
    * deterministic 64-dim integer-valued vector read off the payload
    * digest, computed as pure column expressions in the scan stage
    * (64 substr/instr ops per ASSET — constant work per row, not the
    * per-element fold the no-interpreted-hot-loops rule bans). Around
    * the stub, everything is the real pipeline a CLIP-style deployment
    * runs at 100 TB: broadcast(query features) ⨯ feature-column corpus
    * scan → codegen'd exact dot ([[graft.functions.DotProduct]];
    * digit values 0..15 make every product and partial sum exact, so
    * the integer score is engine-deterministic) → mergeable bounded
    * [[Similarity.topKByQuery]]. Swapping the stub for a real decoder
    * changes ONE select — the retrieval plan, partitioning, and rank
    * semantics are already proven here. The seam is the `featurize`
    * parameter: any assets → (vec_id, media_type, features) frame plugs
    * into the identical downstream retrieval plan
    * ([[MediaRetrievalSeamSpec]] proves the swap with a toy byte-reading
    * decoder — different embeddings, same physical plan shape). */
  def mediaRetrieval(documents: DataFrame, nQueries: Int = 5,
      k: Int = 10,
      featurize: DataFrame => DataFrame = digestFeatures): DataFrame = {
    val feats = featurize(assetsFrom(documents))
    retrieve(feats, nQueries, k)
  }

  /** The default (stub) featurizer: a deterministic 64-dim integer-valued
    * embedding read off the payload digest — pure column expressions,
    * constant work per row, computed in the scan stage. */
  def digestFeatures(assets: DataFrame): DataFrame = {
    val d = md5(col("content"))
    assets
      .withColumn("hx", concat(md5(concat(d, lit(":0"))),
        md5(concat(d, lit(":1")))))
      .select(col("asset_id").as("vec_id"), col("media_type"),
        expr("transform(sequence(1, 64), i -> CAST(" +
          "instr('0123456789abcdef', substr(hx, i, 1)) - 1 AS FLOAT))")
          .as("features"))
  }

  /** m06: VIDEO near-dup by sampled-frame signature Jaccard — the
    * content-based video copy-detection shape (CC_WEB_VIDEO / Wu 2007:
    * a video is the SET of its keyframe fingerprints; two videos are
    * copies when the sets overlap), composed from audited parts: m02's
    * frame slicing and m05's [[graft.functions.BlockBits]] perceptual
    * signature, applied per FRAME instead of per payload. m03 catches
    * the byte-identical re-upload and m05 the lightly-edited still;
    * this catches the TRIMMED/EXTENDED re-post whose payload digest
    * and whole-payload signature both miss — the appended outro
    * changes every global statistic but leaves the shared frames'
    * signatures untouched, and set-Jaccard over frame signatures
    * scores exactly the shared fraction.
    *
    * Fixture: the video slice (asset ids ≡ 2 mod 3) of a TRIPLED
    * corpus — original, byte-identical re-upload (+3,000,000), and a
    * tail-padded "re-encode with an appended outro" (+6,000,000; the
    * outro is the REVERSE of the doc's own opening `frameBytes`, so
    * it is per-doc content — a shared constant pad would itself be
    * the corpus's hottest signature and the fixture would manufacture
    * the very skew the blank filter below exists to kill). Offsets
    * are multiples of 3 so a copy keeps its id-derived media type
    * (m03's +1,000,000 deliberately SHIFTS it — there the label flip
    * is the signal; here type-stable copies are the point).
    * Original↔copy pairs score Jaccard 1; padded pairs score
    * high-but-<1 exactly when the outro frame lands on the stride
    * grid — both engines derive which.
    *
    * BLANK-FRAME FILTER: the all-'0' signature means no block rose
    * above the global mean — uniform content (black frames, silence,
    * filler runs). Blank frames are the classic failure of video
    * copy detection: they match EVERYTHING while identifying nothing,
    * and their posting list is the corpus's quadratic hot key
    * (measured here: at sf0.1×8 the all-zero bucket held 7,088 of
    * 89,622 sig rows and 25.1M of the 25.4M candidate pairs — ~99% of
    * the join for 0% of the signal). Excluding them from the index —
    * standard practice in the CBCD literature — is a semantic choice,
    * not a lossy cap: a video whose SAMPLED frames are all blank has
    * no content identity to match on and reports no pairs.
    *
    * Decision is EXACT integers: `100·|∩| ≥ minJaccardPct·|∪|`
    * cross-multiplied, never a float threshold; the emitted `jaccard`
    * is one division of two exact BIGINTs (bitwise cross-engine).
    *
    * Scale: one scan-stage explode+signature pass per video (payload
    * pruned immediately after — frames never carry the binary column
    * past the scan projection), then the d02 inverted-index shape:
    * distinct (video, sig) rows, a sig-keyed self-join quadratic only
    * within one signature's posting list (after the blank filter the
    * hot keys left are genuinely shared content — AQE skew territory,
    * d11's posting cap the documented lossy escape), two size joins,
    * one pair-keyed partial agg. State per video is its sampled-frame
    * SET (n_frames/stride rows), never the frame bytes. */
  def videoFrameDedup(documents: DataFrame, frameBytes: Int = 128,
      stride: Int = 2, nBlocks: Int = 64,
      minJaccardPct: Int = 50): DataFrame = {
    val base = documents.select(col("doc_id"), col("text"))
    val corpus = base
      .unionByName(base.select((col("doc_id") + 3000000L).as("doc_id"),
        col("text")))
      .unionByName(base.select((col("doc_id") + 6000000L).as("doc_id"),
        concat(col("text"),
          reverse(substring(col("text"), 1, frameBytes))).as("text")))
    val vids = assetsFrom(corpus).filter(col("media_type") === "video")
    val frames = vids
      .withColumn("n_frames",
        ceil(octet_length(col("content")).cast("double") / frameBytes)
          .cast("long"))
      .select(col("asset_id"), col("content"),
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("asset_id"),
        graft.functions.BlockFns.blockBits(
          col("content").substr(
            (col("frame_idx") * frameBytes + 1).cast("int"),
            lit(frameBytes)), nBlocks).as("frame_sig"))
      // blank-frame filter: the all-'0' signature carries no identity
      // and its posting list is the quadratic hot key (see scaladoc)
      .filter(col("frame_sig").contains("1"))
      .distinct()
    val sizes = frames.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sigs"))
    val common = frames.select(col("frame_sig"),
        col("asset_id").as("video_a"))
      .join(frames.select(col("frame_sig"), col("asset_id").as("video_b")),
        "frame_sig")
      .filter(col("video_a") < col("video_b"))
      .groupBy(col("video_a"), col("video_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("asset_id").as("video_a"),
        col("n_sigs").as("n_a")), "video_a")
      .join(sizes.select(col("asset_id").as("video_b"),
        col("n_sigs").as("n_b")), "video_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .filter(col("n_common") * 100 >= col("n_union") * minJaccardPct)
      .select(col("video_a"), col("video_b"), col("n_common"),
        col("n_a"), col("n_b"),
        (col("n_common").cast("double") / col("n_union").cast("double"))
          .as("jaccard"))
      .orderBy(col("video_a"), col("video_b"))
  }

  /** m07: SEQUENCE-aware video similarity — the temporal refinement of
    * [[videoFrameDedup]]: m06's set-Jaccard says "these two videos are
    * built from the same frames"; this adds the ordered 2-gram shingle
    * Jaccard over the frame-signature SEQUENCE, and the gap between
    * the two scores is the RE-EDIT detector (the montage/recut whose
    * frame set matches the original but whose cut order doesn't — the
    * classic set-vs-sequence distinction in video copy detection,
    * temporal-network verification in the CBCD literature). An exact
    * copy scores 1 on both; a rotation/recut keeps the set score but
    * breaks exactly the shingles that straddle its cut points.
    *
    * Fixture: videos of a TRIPLED corpus — original, byte-identical
    * copy (+3,000,000), and a RECUT (+9,000,000: the text rotated at a
    * frame boundary, `mid = (len div 2·fb)·fb` — the frame multiset is
    * preserved except at the seam, so set-J stays high while seq-J
    * drops by the broken shingles; docs shorter than two frames rotate
    * to themselves, deterministically, in both engines). Frames are
    * NOT strided here (every frame participates) — order is the
    * subject, so skipping frames would change the shingle alphabet.
    *
    * Candidates come from the SET index (the m06 machinery, blank
    * signatures excluded) with the same exact ≥ 50% keep — a recut
    * with zero surviving shingles is still found and scored seq-J 0.
    * Shingles where BOTH signatures are blank are excluded for the
    * same hot-key reason as m06's blank filter (a run of black frames
    * orders nothing); a shingle with one blank side keeps the order
    * information of its non-blank neighbor.
    *
    * Scale: m06's shapes plus one per-video `lead` window (partitioned
    * by video, state = one row — sequence order is inherently
    * per-video and each video's frame list is bounded); the shingle
    * pair counts ride a second inverted index joined back LEFT onto
    * the set candidates. Both divisions are exact-BIGINT ratios. */
  def sequenceDedup(documents: DataFrame, frameBytes: Int = 128,
      nBlocks: Int = 64, minSetJaccardPct: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = documents.select(col("doc_id"), col("text"))
    val mid = expr(s"(length(text) div ${2 * frameBytes})" +
      s" * ${frameBytes}")
    val corpus = base
      .unionByName(base.select((col("doc_id") + 3000000L).as("doc_id"),
        col("text")))
      .unionByName(base.select((col("doc_id") + 9000000L).as("doc_id"),
        concat(
          col("text").substr((mid + lit(1)).cast("int"),
            lit(1000000000)),
          col("text").substr(lit(1), mid.cast("int"))).as("text")))
    val vids = assetsFrom(corpus).filter(col("media_type") === "video")
    val frames = vids
      .withColumn("n_frames",
        ceil(octet_length(col("content")).cast("double") / frameBytes)
          .cast("long"))
      .select(col("asset_id"), col("content"),
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<bigint>"))).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        graft.functions.BlockFns.blockBits(
          col("content").substr(
            (col("frame_idx") * frameBytes + 1).cast("int"),
            lit(frameBytes)), nBlocks).as("sig"))
    val sets = frames.filter(col("sig").contains("1"))
      .select(col("asset_id"), col("sig")).distinct()
    val setSizes = sets.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sigs"))
    val cand = sets.select(col("sig"), col("asset_id").as("video_a"))
      .join(sets.select(col("sig"), col("asset_id").as("video_b")), "sig")
      .filter(col("video_a") < col("video_b"))
      .groupBy(col("video_a"), col("video_b"))
      .agg(count(lit(1)).as("set_common"))
      .join(setSizes.select(col("asset_id").as("video_a"),
        col("n_sigs").as("n_a")), "video_a")
      .join(setSizes.select(col("asset_id").as("video_b"),
        col("n_sigs").as("n_b")), "video_b")
      .filter(col("set_common") * 100 >=
        (col("n_a") + col("n_b") - col("set_common")) * minSetJaccardPct)
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    val shingles = frames
      .withColumn("nxt", lead(col("sig"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .filter(col("sig").contains("1") || col("nxt").contains("1"))
      .select(col("asset_id"),
        concat(col("sig"), lit("|"), col("nxt")).as("sh"))
      .distinct()
    val shSizes = shingles.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sh"))
    val shCommon = shingles.select(col("sh"), col("asset_id").as("video_a"))
      .join(shingles.select(col("sh"), col("asset_id").as("video_b")),
        "sh")
      .filter(col("video_a") < col("video_b"))
      .groupBy(col("video_a"), col("video_b"))
      .agg(count(lit(1)).as("seq_common"))
    val withSeq = cand
      .join(shCommon, Seq("video_a", "video_b"), "left")
      .join(shSizes.select(col("asset_id").as("video_a"),
        col("n_sh").as("sh_a")), Seq("video_a"), "left")
      .join(shSizes.select(col("asset_id").as("video_b"),
        col("n_sh").as("sh_b")), Seq("video_b"), "left")
      .select(col("video_a"), col("video_b"), col("set_common"),
        col("n_a"), col("n_b"),
        coalesce(col("seq_common"), lit(0L)).as("seq_common"),
        coalesce(col("sh_a"), lit(0L)).as("sh_a"),
        coalesce(col("sh_b"), lit(0L)).as("sh_b"))
    withSeq
      .withColumn("set_union",
        col("n_a") + col("n_b") - col("set_common"))
      .withColumn("seq_union",
        col("sh_a") + col("sh_b") - col("seq_common"))
      .select(col("video_a"), col("video_b"), col("set_common"),
        col("n_a"), col("n_b"), col("seq_common"), col("sh_a"),
        col("sh_b"),
        (col("set_common").cast("double") /
          col("set_union").cast("double")).as("set_jaccard"),
        when(col("seq_union") === 0L, lit(0.0))
          .otherwise(col("seq_common").cast("double") /
            col("seq_union").cast("double")).as("seq_jaccard"))
      .orderBy(col("video_a"), col("video_b"))
  }

  /** The featurizer-independent retrieval tail of [[mediaRetrieval]]. */
  private def retrieve(feats: DataFrame, nQueries: Int,
      k: Int): DataFrame = {
    val queries = feats.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("features").as("qf"))
    val scored = feats.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("score",
        graft.functions.VectorOps.dot(col("features"), col("qf")))
    // the top-k result (nQueries·k rows) is the hinted BROADCAST build
    // side of the media_type re-attach — it derives from an aggregate,
    // so Catalyst's size estimate can't be trusted, and a sort-merge
    // fallback would shuffle the corpus-sized feature frame
    feats.select(col("vec_id").as("neighbor_id"), col("media_type"))
      .join(broadcast(Similarity.topKByQuery(scored, "score", k)),
        "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("media_type"),
        col("score").cast("long").as("score"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
