package graft.images

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import graft.config.GoldenConfig

class ImageCodecSpec extends AnyFlatSpec with Matchers {
  import ImageCodec._

  private val px = proceduralPixels(GoldenConfig.Seed, 0L, 32, 32)
  private val px2 = proceduralPixels(GoldenConfig.Seed, 1L, 32, 32)

  "codec" should "round-trip PNG losslessly" in {
    val bytes = encodePng(px, 32, 32)
    val (dec, w, h) = decode(bytes)
    (w, h) shouldBe ((32, 32))
    dec shouldBe px
    psnr(bytes, encodePng(px, 32, 32)) shouldBe 99.0
  }

  it should "re-encode JPEG within the lossy PSNR band (>= 40 dB)" in {
    val png = encodePng(px, 32, 32)
    val jpg = encodeJpeg(px, 32, 32, 0.97f)
    val p = psnr(png, jpg)
    info(s"PSNR(png, jpeg q97) = $p dB")
    p should be >= GoldenConfig.PsnrMinDb
  }

  it should "give low PSNR for unrelated images" in {
    val a = encodePng(px, 32, 32)
    val b = encodePng(px2, 32, 32)
    psnr(a, b) should be < 25.0
  }

  "phash" should "be stable under JPEG re-encode (Hamming <= 3)" in {
    val ph = phash(px, 32, 32)
    val jph = phashOfBytes(encodeJpeg(px, 32, 32, 0.97f))
    info(s"hamming = ${hamming(ph, jph)}")
    hamming(ph, jph) should be <= GoldenConfig.HammingMax
  }

  it should "be far apart for unrelated images (Hamming >= 10)" in {
    hamming(phash(px, 32, 32), phash(px2, 32, 32)) should be >= 10
  }

  it should "be deterministic" in {
    phash(px, 32, 32) shouldBe phash(proceduralPixels(GoldenConfig.Seed, 0L, 32, 32), 32, 32)
  }
}
