package graft.operators

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.config.ScoreConfig

class EvaluationSpec extends AnyFlatSpec with Matchers with SparkTestBase {
  import spark.implicits._

  "thresholdCurve" should "match a hand-computed confusion table" in {
    // 4 scored pairs: scores 900(gold), 700(gold), 600(not), 200(not)
    val scored = Seq(
      (900L, true), (700L, true), (600L, false), (200L, false)
    ).toDF("score_millis", "gold")
    val rows = Evaluation.thresholdCurve(scored, steps = 10)
      .orderBy("thresh_millis")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Long]("precision_millis"), r.getAs[Long]("recall_millis")))
    rows should have length 11
    // t=0: everything predicted → tp=2 fp=2 fn=0, P=500, R=1000
    rows(0) shouldBe ((0L, 2L, 2L, 0L, 500L, 1000L))
    // t=700: predicted = {900, 700} → tp=2 fp=0 fn=0, P=1000, R=1000
    rows(7) shouldBe ((700L, 2L, 0L, 0L, 1000L, 1000L))
    // t=800: predicted = {900} → tp=1 fp=0 fn=1, P=1000, R=500
    rows(8) shouldBe ((800L, 1L, 0L, 1L, 1000L, 500L))
    // t=1000: predicted = {} → tp=0 fp=0 fn=2, P=0 (guarded), R=0
    rows(10) shouldBe ((1000L, 0L, 0L, 2L, 0L, 0L))
  }

  it should "compute F1 as the integer harmonic mean" in {
    val scored = Seq((900L, true), (900L, false)).toDF("score_millis", "gold")
    val r = Evaluation.thresholdCurve(scored, steps = 10)
      .where(col("thresh_millis") === 500L).head()
    // tp=1 fp=1 fn=0 → F1 = 2*1*1000 / (2+1+0) = 666
    r.getAs[Long]("f1_millis") shouldBe 666L
  }

  "weightedScore" should "fold measures under config weights with integer division" in {
    val df = Seq((800L, 900L, 1000L)).toDF("jaccard_millis", "dice_millis", "overlap_millis")
    val score = Evaluation.weightedScore(df, ScoreConfig.default)
      .head().getAs[Long]("score_millis")
    // (800*500 + 900*300 + 1000*200) / 1000 = 870
    score shouldBe 870L
  }

  it should "respect custom weights" in {
    val df = Seq((0L, 1000L)).toDF("m1", "m2")
    val cfg = ScoreConfig(Seq("m1" -> 3L, "m2" -> 1L))
    Evaluation.weightedScore(df, cfg).head().getAs[Long]("score_millis") shouldBe 250L
  }

  "ScoreConfig" should "round-trip through its serialized form" in {
    val cfg = ScoreConfig(Seq("jaccard_millis" -> 500L, "phash_hamming_millis" -> 250L,
      "dice_millis" -> 250L))
    ScoreConfig.parse(cfg.serialize) shouldBe cfg
    ScoreConfig.parse(ScoreConfig.default.serialize) shouldBe ScoreConfig.default
  }

  it should "reject malformed input" in {
    an[IllegalArgumentException] should be thrownBy ScoreConfig.parse("novalue")
    an[IllegalArgumentException] should be thrownBy ScoreConfig(Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      ScoreConfig(Seq("m" -> 1L, "m" -> 2L))
  }
}
