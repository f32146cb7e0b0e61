package graft.audio

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AudioOpsSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  private def clip(seed: Int, n: Int = 8000): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt().toByte)
  }

  "sampleWindowsMs" should "hop through the clip and always yield a window" in {
    AudioOps.sampleWindowsMs(10000L, 1000L, 1000L) shouldBe (0L to 9000L by 1000L)
    AudioOps.sampleWindowsMs(2500L, 1000L, 500L) shouldBe Seq(0L, 500L, 1000L, 1500L)
    AudioOps.sampleWindowsMs(300L, 1000L, 1000L) shouldBe Seq(0L)
  }

  "featureTable" should "emit one deterministic row per hop window" in {
    val a = clip(1)
    val df = Seq(("a1", a, 10000L), ("a2", a, 10000L)).toDF("audio_id", "bytes", "duration_ms")
    val ft = AudioOps.featureTable(df, "audio_id", "bytes", "duration_ms")
    ft.where(col("audio_id") === "a1").count() shouldBe 10L
    // identical bytes → identical per-window features
    val h1 = ft.where(col("audio_id") === "a1").orderBy("window_idx")
      .select("window_hash").as[Long].collect()
    val h2 = ft.where(col("audio_id") === "a2").orderBy("window_idx")
      .select("window_hash").as[Long].collect()
    h1 shouldBe h2
    h1.distinct.length should be > 1 // windows see different content slices
  }

  it should "skip null or empty clips" in {
    val df = Seq(("a1", Array.empty[Byte], 1000L), ("a2", null.asInstanceOf[Array[Byte]], 1000L))
      .toDF("audio_id", "bytes", "duration_ms")
    AudioOps.featureTable(df, "audio_id", "bytes", "duration_ms").count() shouldBe 0L
  }

  "fingerprints" should "place a tail-edited clip near the original and unrelated clips far" in {
    val base = clip(7, 16000)
    val edited = base.clone()
    // corrupt the last ~6% — the stub decodes each window from its own
    // byte slice, so early windows (and their hashes) are untouched
    (15000 until 16000).foreach(i => edited(i) = (edited(i) ^ 0x5a).toByte)
    val df = Seq(
      ("orig", base, 16000L),
      ("edit", edited, 16000L),
      ("same", base.clone(), 16000L),
      ("other", clip(8, 16000), 16000L)
    ).toDF("audio_id", "bytes", "duration_ms")
    val fp = AudioOps.fingerprints(
      AudioOps.featureTable(df, "audio_id", "bytes", "duration_ms"))
    val m = fp.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    m("same") shouldBe m("orig") // identical clips → identical fingerprint
    val dEdit = java.lang.Long.bitCount(m("orig") ^ m("edit"))
    val dOther = java.lang.Long.bitCount(m("orig") ^ m("other"))
    info(s"hamming(orig, edit) = $dEdit, hamming(orig, other) = $dOther")
    dEdit should be < dOther
    dEdit should be <= 16
    dOther should be > 16
  }

  it should "compose with the SimHash Hamming dedup path" in {
    val base = clip(21, 16000)
    val edited = base.clone()
    (15500 until 16000).foreach(i => edited(i) = (edited(i) ^ 0x11).toByte)
    val df = Seq(
      (1L, base, 16000L), (2L, edited, 16000L), (3L, clip(22, 16000), 16000L)
    ).toDF("audio_id", "bytes", "duration_ms")
    val fp = AudioOps.fingerprints(
      AudioOps.featureTable(df, "audio_id", "bytes", "duration_ms"))
    val pairs = graft.operators.SimHashNearDup
      .nearDupPairs(fp, bits = 64, maxDist = 16)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L)) // the edit pairs with its original, clip 3 with nothing
  }
}
