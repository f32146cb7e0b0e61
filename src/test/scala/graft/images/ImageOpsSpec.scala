package graft.images

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ImageOpsSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def solidPng(rgb: Int, w: Int = 16, h: Int = 12): Array[Byte] =
    ImageCodec.encodePng(Array.fill(w * h)(rgb), w, h)

  "resizePng" should "hit the target dims and preserve solid colors" in {
    val resized = ImageOps.resizePng(solidPng(0xAA3311), 5, 7)
    val (px, w, h) = ImageCodec.decode(resized)
    (w, h) shouldBe ((5, 7))
    all(px.map(_ & 0xFFFFFF)) shouldBe 0xAA3311
  }

  it should "average blocks (two-tone image → mixed cell)" in {
    // left half red, right half blue; 1x1 resize = global average
    val w = 8; val h = 8
    val px = Array.tabulate(w * h)(i => if (i % w < w / 2) 0xFF0000 else 0x0000FF)
    val out = ImageOps.boxResize(px, w, h, 1, 1)
    out(0) shouldBe 0x7F007F // (255/2, 0, 255/2)
  }

  "grayscalePng" should "make R=G=B with the BT.601 luma" in {
    val gray = ImageOps.grayscalePng(solidPng(0xFF0000)) // pure red
    val (px, _, _) = ImageCodec.decode(gray)
    val g = (255 * 299) / 1000
    all(px.map(_ & 0xFFFFFF)) shouldBe ((g << 16) | (g << 8) | g)
  }

  "featureTable" should "extract dims, phash and size as columns" in {
    val rows = Seq(
      ("a", solidPng(0x123456, 16, 12)),
      ("b", solidPng(0x654321, 8, 8))
    ).toDF("image_id", "bytes")
    val feats = ImageOps.featureTable(rows, "image_id", "bytes")
      .orderBy("id").collect()
    feats.map(_.getString(0)) shouldBe Array("a", "b")
    feats(0).getInt(1) shouldBe 16
    feats(0).getInt(2) shouldBe 12
    feats(1).getInt(1) shouldBe 8
    feats(0).getLong(3) shouldBe ImageCodec.phashOfBytes(
      rows.where(col("image_id") === "a").head().getAs[Array[Byte]]("bytes"))
    feats(0).getInt(4) should be > 0
  }

  "resize UDFs" should "run as column transforms over binary columns" in {
    val rows = Seq(("a", solidPng(0x00FF00))).toDF("image_id", "bytes")
    val out = rows.select(ImageOps.resizeUdf(4, 4)(col("bytes")).as("small"),
        ImageOps.grayscaleUdf(col("bytes")).as("gray"))
      .head()
    val (spx, sw, sh) = ImageCodec.decode(out.getAs[Array[Byte]]("small"))
    (sw, sh) shouldBe ((4, 4))
    all(spx.map(_ & 0xFFFFFF)) shouldBe 0x00FF00
    val (gpx, _, _) = ImageCodec.decode(out.getAs[Array[Byte]]("gray"))
    val g = (255 * 587) / 1000
    all(gpx.map(_ & 0xFFFFFF)) shouldBe ((g << 16) | (g << 8) | g)
  }
}
