package graft.images

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column transforms over opaque `binary` image columns
  * (builder-prompt "decode / feature-extract / resize" surface; the codecs
  * are real JDK ImageIO — no stub needed in this environment).
  *
  * Spark shape: each transform is a scalar UDF over the bytes column —
  * self-contained per row, so it parallelizes by partition with no shuffle
  * and composes with the column-pruning rule that keeps `bytes` out of
  * every dedup shuffle (transform at the scan, or semi-join bytes down to
  * the rows that need it first — see ImageDedupPipeline's PSNR stage).
  */
object ImageOps {

  /** Integer box-filter resize (area average) — deterministic, no AWT
    * scaler. Returns row-major RGB ints. */
  private[images] def boxResize(px: Array[Int], w: Int, h: Int,
                                w2: Int, h2: Int): Array[Int] = {
    require(w2 > 0 && h2 > 0, "target dims must be positive")
    val sumR = new Array[Long](w2 * h2)
    val sumG = new Array[Long](w2 * h2)
    val sumB = new Array[Long](w2 * h2)
    val cnt = new Array[Long](w2 * h2)
    var y = 0
    while (y < h) {
      val cy = math.min(h2 - 1, y * h2 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(w2 - 1, x * w2 / w)
        val p = px(y * w + x)
        val c = cy * w2 + cx
        sumR(c) += (p >> 16) & 0xFF
        sumG(c) += (p >> 8) & 0xFF
        sumB(c) += p & 0xFF
        cnt(c) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](w2 * h2)
    var i = 0
    while (i < out.length) {
      val n = math.max(1L, cnt(i))
      out(i) = (((sumR(i) / n).toInt & 0xFF) << 16) |
        (((sumG(i) / n).toInt & 0xFF) << 8) | ((sumB(i) / n).toInt & 0xFF)
      i += 1
    }
    out
  }

  /** decode → box resize → re-encode PNG. */
  def resizePng(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val (px, w, h) = ImageCodec.decode(bytes)
    ImageCodec.encodePng(boxResize(px, w, h, w2, h2), w2, h2)
  }

  /** decode → luma grayscale (BT.601 integer weights, same scheme as the
    * phash) → re-encode PNG. */
  def grayscalePng(bytes: Array[Byte]): Array[Byte] = {
    val (px, w, h) = ImageCodec.decode(bytes)
    val out = new Array[Int](px.length)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = ((((p >> 16) & 0xFF) * 299L + ((p >> 8) & 0xFF) * 587L +
        (p & 0xFF) * 114L) / 1000L).toInt
      out(i) = (g << 16) | (g << 8) | g
      i += 1
    }
    ImageCodec.encodePng(out, w, h)
  }

  /** Column transforms (UDFs — per-row codec work can't be a Catalyst
    * expression without reimplementing ImageIO; the bytes column never
    * enters a shuffle around them). */
  def resizeUdf(w2: Int, h2: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) null else resizePng(b, w2, h2))

  val grayscaleUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) null else grayscalePng(b))

  /** (id, w, h, phash, n_bytes) feature table from an (idCol, bytesCol)
    * input — the decode/feature-extract stage of a multimodal pipeline. */
  def featureTable(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val featUdf = udf((b: Array[Byte]) =>
      if (b == null) null
      else {
        val (px, w, h) = ImageCodec.decode(b)
        (w, h, ImageCodec.phash(px, w, h), b.length)
      })
    df.select(col(idCol).as("id"), featUdf(col(bytesCol)).as("f"))
      .select(col("id"), col("f._1").as("w"), col("f._2").as("h"),
        col("f._3").as("phash"), col("f._4").as("n_bytes"))
  }
}
