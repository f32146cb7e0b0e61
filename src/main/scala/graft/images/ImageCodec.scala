package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** Image byte-level plumbing for the input_hint table
  * (image_id, bytes: binary, w, h, fmt, caption, phash).
  *
  * Real codecs (JDK ImageIO PNG/JPEG — no external deps), used in two
  * places only: the deterministic synthetic generator and the pair-local
  * PSNR verify stage (SURVEY §2 B9). Nothing here ever runs at scan scale:
  * `bytes` is projected away at the pipeline door and re-joined only for
  * verified candidate pairs.
  */
object ImageCodec {

  // ImageIO's registry lookups and file-backed stream cache are synchronized
  // and destroy scaling under local[32] (measured 3.2x cpu inflation per
  // encode at 32 threads). Resolve the service providers ONCE and create
  // per-call writer/reader instances from them; keep streams in memory.
  ImageIO.setUseCache(false)
  private val pngWriterSpi =
    ImageIO.getImageWritersByFormatName("png").next().getOriginatingProvider
  private val jpgWriterSpi =
    ImageIO.getImageWritersByFormatName("jpg").next().getOriginatingProvider
  private val pngReaderSpi =
    ImageIO.getImageReadersByFormatName("png").next().getOriginatingProvider
  private val jpgReaderSpi =
    ImageIO.getImageReadersByFormatName("jpg").next().getOriginatingProvider

  /** Deterministic procedural pixels for a synthetic image (FIXTURES.md §2):
    * an 8×8 grid of flat brightness blocks (independent per-image random
    * levels) + mild per-pixel noise. Returns row-major ARGB ints (opaque).
    *
    * Why blocks: (a) 64 independent block levels make phash effectively
    * uniform over 2^64 — unrelated images sit at Hamming ≈ 32 (the fixture
    * demands >= 20), unlike smooth gradients which collapsed 20k images
    * onto 452 phash values and exploded the image candidate join;
    * (b) flat 8px blocks align with JPEG's DCT grid, so a q97 re-encode
    * stays comfortably above the 40 dB PSNR band. */
  def proceduralPixels(seed: Long, id: Long, w: Int, h: Int): Array[Int] = {
    val rnd = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
    val levels = Array.fill(64)(16 + rnd.nextInt(224))
    val tint = rnd.nextInt(48)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val g = levels(cy * 8 + cx)
        val noise = rnd.nextInt(6)
        val r = math.min(255, g + noise)
        val gg = math.min(255, g + 2 * noise)
        val b = math.min(255, math.max(0, g - tint + noise))
        px(y * w + x) = 0xFF000000 | (r << 16) | (gg << 8) | b
        x += 1
      }
      y += 1
    }
    px
  }

  private def toImage(px: Array[Int], w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = pngWriterSpi.createWriterInstance()
    val ios = new MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(toImage(px, w, h))
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  def encodeJpeg(px: Array[Int], w: Int, h: Int, quality: Float = 0.9f): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = jpgWriterSpi.createWriterInstance()
    val ios = new MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new IIOImage(toImage(px, w, h), null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode to row-major RGB ints; returns (pixels, w, h). Format sniffed
    * from magic bytes (PNG 89 50 4E 47 / JPEG FF D8). */
  def decode(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val spi =
      if (bytes.length > 1 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) jpgReaderSpi
      else pngReaderSpi
    val reader = spi.createReaderInstance()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val img = reader.read(0)
      val w = img.getWidth; val h = img.getHeight
      (img.getRGB(0, 0, w, h, null, 0, w), w, h)
    } finally { reader.dispose(); iis.close() }
  }

  /** PSNR in dB over RGB channels; identical images → capped at 99.0. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    if (java.util.Arrays.equals(a, b)) return 99.0
    val (pa, wa, ha) = decode(a)
    val (pb, wb, hb) = decode(b)
    if (wa != wb || ha != hb) return 0.0
    var se = 0.0
    var i = 0
    while (i < pa.length) {
      val x = pa(i); val y = pb(i)
      val dr = ((x >> 16) & 0xFF) - ((y >> 16) & 0xFF)
      val dg = ((x >> 8) & 0xFF) - ((y >> 8) & 0xFF)
      val db = (x & 0xFF) - (y & 0xFF)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (pa.length * 3.0)
    if (mse == 0.0) 99.0 else math.min(99.0, 10.0 * math.log10(255.0 * 255.0 / mse))
  }

  /** 64-bit average-hash (aHash): mean-threshold the 8x8 box-downscaled
    * grayscale. Pure integer box filter — platform-independent (no AWT
    * scaler). Documented constant scheme (FIXTURES.md §2); this is the
    * "SimHash over decoded-pixel features" key of the image path. */
  def phash(px: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val p = px(y * w + x)
        val gray = ((p >> 16) & 0xFF) * 299L + ((p >> 8) & 0xFF) * 587L + (p & 0xFF) * 114L
        cells(cy * 8 + cx) += gray
        counts(cy * 8 + cx) += 1000L
        x += 1
      }
      y += 1
    }
    var total = 0.0
    val means = new Array[Double](64)
    var i = 0
    while (i < 64) { means(i) = cells(i).toDouble / counts(i); total += means(i); i += 1 }
    val avg = total / 64.0
    var bits = 0L
    i = 0
    while (i < 64) { if (means(i) > avg) bits |= (1L << i); i += 1 }
    bits
  }

  def phashOfBytes(bytes: Array[Byte]): Long = {
    val (px, w, h) = decode(bytes)
    phash(px, w, h)
  }

  /** The 8×8 box-downscaled grayscale block (integer cell means, 0..255)
    * that [[phash]] thresholds — exposed so the DCT path
    * ([[PerceptualHash.dctHash]]) can consume REAL decoded pixels with the
    * same pinned box filter. Row-major: block(8·cy + cx). */
  def gray8x8(px: Array[Int], w: Int, h: Int): Array[Long] = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val p = px(y * w + x)
        val gray = ((p >> 16) & 0xFF) * 299L + ((p >> 8) & 0xFF) * 587L + (p & 0xFF) * 114L
        cells(cy * 8 + cx) += gray
        counts(cy * 8 + cx) += 1000L
        x += 1
      }
      y += 1
    }
    Array.tabulate(64)(i => if (counts(i) == 0L) 0L else cells(i) / counts(i))
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
