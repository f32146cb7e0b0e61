package graft.images

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class VideoFramesSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  "sampleOffsetsMs" should "mid-cell sample uniformly" in {
    VideoFrames.sampleOffsetsMs(1000, 4) shouldBe Seq(125L, 375L, 625L, 875L)
    VideoFrames.sampleOffsetsMs(1000, 1) shouldBe Seq(500L)
  }

  "sampleFrames" should "explode one decodable frame row per offset, deterministically" in {
    val vids = Seq(
      ("v1", Array[Byte](1, 2, 3, 4), 1000L),
      ("v2", Array[Byte](9, 9, 9), 500L)
    ).toDF("video_id", "bytes", "duration_ms")
    val frames = VideoFrames.sampleFrames(vids, "video_id", "bytes", "duration_ms",
      framesPerVideo = 2)
    val rows = frames.orderBy("video_id", "offset_ms").collect()
    rows.map(r => (r.getString(0), r.getLong(1))) shouldBe
      Array(("v1", 250L), ("v1", 750L), ("v2", 125L), ("v2", 375L))
    // frames are real PNGs (decodable by the image path)
    val (px, w, h) = ImageCodec.decode(rows.head.getAs[Array[Byte]]("frame_png"))
    (w, h) shouldBe ((32, 32))
    px should have length 32 * 32
    // deterministic: same video+offset → identical frame bytes
    val again = VideoFrames.sampleFrames(vids, "video_id", "bytes", "duration_ms", 2)
      .orderBy("video_id", "offset_ms").collect()
    again.map(_.getAs[Array[Byte]]("frame_png").toSeq) shouldBe
      rows.map(_.getAs[Array[Byte]]("frame_png").toSeq)
  }

  it should "compose with the image feature path (frames → phash dedup)" in {
    // two byte-identical videos share every sampled frame → their frames
    // get identical phashes; a different video diverges
    val vids = Seq(
      ("a", Array[Byte](5, 5, 5), 800L),
      ("b", Array[Byte](5, 5, 5), 800L),
      ("c", Array[Byte](7, 7, 7), 800L)
    ).toDF("video_id", "bytes", "duration_ms")
    val frames = VideoFrames.sampleFrames(vids, "video_id", "bytes", "duration_ms", 2)
    val feats = ImageOps.featureTable(
        frames.select(concat_ws("#", col("video_id"), col("offset_ms")).as("fid"),
          col("frame_png")),
        "fid", "frame_png")
      .select(col("id"), col("phash")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    feats("a#200") shouldBe feats("b#200")
    feats("a#600") shouldBe feats("b#600")
    feats("a#200") should not be feats("c#200")
  }

  "fingerprints" should "pair identical clips through the Hamming near-dup path" in {
    val vids = Seq(
      ("a", Array[Byte](5, 5, 5), 800L),   // a and b: byte-identical clips
      ("b", Array[Byte](5, 5, 5), 800L),
      ("c", Array[Byte](7, 7, 7), 800L)    // different content
    ).toDF("video_id", "bytes", "duration_ms")
    val fp = VideoFrames.fingerprints(
        VideoFrames.sampleFrames(vids, "video_id", "bytes", "duration_ms", 4))
      .localCheckpoint()
    val byId = fp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byId("a") shouldBe byId("b")
    byId("a") should not be byId("c")
    // and the fingerprints feed the 64-bit Hamming dedup path unchanged
    val pairs = graft.operators.SimHashNearDup.nearDupPairs(fp, bits = 64)
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    pairs should contain(("a", "b"))
    pairs.flatMap(p => Set(p._1, p._2)) should not contain "c"
  }
}
