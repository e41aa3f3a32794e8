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
