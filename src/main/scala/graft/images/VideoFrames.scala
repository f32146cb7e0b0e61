package graft.images

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Video frame-sampling plumbing (builder-prompt multimodal surface:
  * "image/audio/video as opaque binary columns with typed metadata;
  * decode / frame-sample ... STUB the decode step behind a deterministic
  * fake when the codec libs aren't in the container").
  *
  * REAL here: the schema contract (video_id, bytes, duration_ms, fps), the
  * offset sampler, the explode shape (one row per sampled frame), and the
  * composition — sampled frames are PNG bytes that flow straight into the
  * IMAGE path (ImageOps.featureTable → phash → SimHash dedup).
  *
  * STUBBED here: the actual H.264/VP9 decode — no video codec ships in
  * /opt/spark/jars or the JDK. `decodeFrameStub` renders a deterministic
  * procedural frame seeded by (xxhash of the video bytes, offset), so the
  * pipeline is fully testable end-to-end: identical videos yield identical
  * frames, different videos diverge. Swap `decodeFrameStub` for a JNI/
  * ffmpeg binding on a real deployment; nothing else changes.
  */
object VideoFrames {

  /** k frame offsets uniformly spaced in [0, durationMs) — deterministic,
    * first frame at duration/(2k) (mid-cell sampling). */
  def sampleOffsetsMs(durationMs: Long, k: Int): Seq[Long] = {
    require(k > 0 && durationMs > 0, "need positive duration and k")
    (0 until k).map(i => durationMs * (2 * i + 1) / (2 * k))
  }

  /** STUB frame decode (see scaladoc): deterministic 32x32 PNG from the
    * video's content hash and the frame offset. */
  def decodeFrameStub(videoBytes: Array[Byte], offsetMs: Long,
                      w: Int = 32, h: Int = 32): Array[Byte] = {
    val seed = java.util.Arrays.hashCode(videoBytes).toLong
    val px = ImageCodec.proceduralPixels(seed, offsetMs, w, h)
    ImageCodec.encodePng(px, w, h)
  }

  /** (video_id, offset_ms, frame_png): one row per sampled frame per video.
    * Input: (idCol, bytesCol, durationMsCol) — frames are image bytes, so
    * the output feeds ImageOps.featureTable / the phash dedup path
    * directly. framesPerVideo bounds the explode factor (no unbounded
    * fan-out at 100 TB). */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
                   durationMsCol: String, framesPerVideo: Int = 4): DataFrame = {
    val frameUdf = udf((b: Array[Byte], durMs: Long) =>
      if (b == null || durMs <= 0) Seq.empty[(Long, Array[Byte])]
      else sampleOffsetsMs(durMs, framesPerVideo)
        .map(off => (off, decodeFrameStub(b, off))))
    df.select(col(idCol).as("video_id"),
        explode(frameUdf(col(bytesCol), col(durationMsCol))).as("f"))
      .select(col("video_id"), col("f._1").as("offset_ms"),
        col("f._2").as("frame_png"))
  }

  /** Per-video 64-bit temporal fingerprint: majority vote over the sampled
    * frames' phashes (the video sibling of
    * [[graft.audio.AudioOps.fingerprints]]): frames decode through the
    * IMAGE path ([[ImageOps.featureTable]] — real PNG decode + phash), so
    * with a real codec behind [[decodeFrameStub]] this is a production
    * video near-dup signature; with the stub, identical videos share all
    * frames and land at Hamming 0 (the stub seeds frames from the WHOLE
    * clip's bytes, so an edited clip diverges everywhere — unlike the
    * audio stub's per-slice decode; property documented in the spec).
    * Output (id, simhash) feeds
    * [[graft.operators.SimHashNearDup.nearDupPairs]](bits = 64). */
  def fingerprints(frames: DataFrame): DataFrame =
    graft.operators.SimHashNearDup.majorityFingerprint(
      ImageOps.featureTable(frames, "video_id", "frame_png"), "id", "phash")
}
