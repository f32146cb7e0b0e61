package graft.images

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.config.GoldenConfig

class PerceptualHashSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def hashOf(blocks: (Long, Array[Long])*): Map[Long, (Long, Long)] =
    PerceptualHash.signatures(blocks.toSeq.toDF("id", "block"), "id", "block")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  "dctHash" should "hash a constant block to zero and be exactly brightness-shift invariant" in {
    val flat = Array.fill(64)(100L)
    val ramp = Array.tabulate(64)(i => (i * 4).toLong) // 0..252
    val rampShift = ramp.map(_ + 3L)                   // +3 everywhere: only DC moves
    val edited = ramp.clone(); edited(27) = 255L; edited(36) = 0L
    val out = hashOf(1L -> flat, 2L -> ramp, 3L -> rampShift, 4L -> edited)
    out(1L) shouldBe ((0L, 0L)) // all AC coefficients 0 → no bit exceeds the median
    // DCT AC basis rows sum to zero (exact in the fixed-point table by its
    // cosine symmetries), so a constant intensity shift changes no AC bit
    out(3L) shouldBe out(2L)
    out(4L) should not be out(2L) // a local edit flips AC structure
  }

  it should "agree between the real decoded-pixel path and the block contract" in {
    // real path: procedural PNG → decode → pinned 8×8 box grayscale → DCT
    val imgs = (0L until 4L).map { id =>
      val bytes = ImageCodec.encodePng(
        ImageCodec.proceduralPixels(GoldenConfig.Seed, id, 32, 32), 32, 32)
      val (px, w, h) = ImageCodec.decode(bytes)
      id -> ImageCodec.gray8x8(px, w, h)
    }
    val sigs = hashOf(imgs: _*)
    sigs.size shouldBe 4
    sigs.values.toSet.size shouldBe 4 // distinct images → distinct signatures
    // deterministic: re-encoding the same pixels re-derives the same hash
    hashOf(imgs.head) shouldBe Map(imgs.head._1 -> sigs(imgs.head._1))
  }

  "nearDupPairs" should "find all pairs within the Hamming radius via the pigeonhole band join" in {
    // craft signatures by flipping specific bits of a base (hi: 31 bits, lo: 32)
    val base = (0x12345678L >> 1, 0x9abcdef0L & 0xFFFFFFFFL)
    def flipLo(v: Long, bits: Int*): Long = bits.foldLeft(v)((a, b) => a ^ (1L << b))
    val sigs = Seq(
      (1L, base._1, base._2),
      (2L, base._1, flipLo(base._2, 0)),            // dist 1
      (3L, base._1, flipLo(base._2, 1, 7, 13, 30)), // dist 4
      (4L, base._1 ^ 0x7FFFFFFFL, ~base._2 & 0xFFFFFFFFL) // far from everything
    ).toDF("id", "phash_hi", "phash_lo")
    val pairs = PerceptualHash.nearDupPairs(sigs, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs((1L, 2L)) shouldBe 1L
    pairs((1L, 3L)) shouldBe 4L // distance EXACTLY maxDist is caught
    pairs.contains((2L, 3L)) shouldBe false // their distance is 5 > maxDist
    pairs.keySet.exists(_ match { case (a, b) => a == 4L || b == 4L }) shouldBe false
    pairs.keys.foreach { case (a, b) => a should be < b }
  }
}
