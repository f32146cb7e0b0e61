package graft.config

/** Configurable multi-measure scoring weights — the Spark-native analog of
  * the reference's per-attribute ScoreConfig (similarity measure + weight
  * per attribute, R:.../deduplication/models/ScoreConfig.scala +
  * config XML): each entry maps a measure COLUMN name (an integer
  * milli-score, e.g. "jaccard_millis") to an integer weight. The combined
  * score is the weighted mean in milli-units (integer division), computed
  * by [[graft.operators.Evaluation.weightedScore]].
  *
  * Serialization is a deterministic single-line text form (`m:w,m:w,...`,
  * insertion-ordered) so job configs round-trip without a JSON library. */
final case class ScoreConfig(weights: Seq[(String, Long)]) {
  require(weights.nonEmpty, "ScoreConfig needs at least one measure")
  require(weights.forall(_._2 >= 0), "weights must be non-negative")
  require(weights.map(_._1).distinct.size == weights.size,
    "duplicate measure name in ScoreConfig")

  def serialize: String =
    weights.map { case (m, w) => s"$m:$w" }.mkString(",")
}

object ScoreConfig {
  /** Default flagship config: Jaccard-dominant with Dice and Overlap
    * support (weights sum to 1000 so score_millis stays a milli-unit). */
  val default: ScoreConfig = ScoreConfig(Seq(
    "jaccard_millis" -> 500L,
    "dice_millis" -> 300L,
    "overlap_millis" -> 200L))

  def parse(s: String): ScoreConfig =
    ScoreConfig(s.split(",").toSeq.map { kv =>
      kv.split(":") match {
        case Array(m, w) => (m.trim, w.trim.toLong)
        case _ => throw new IllegalArgumentException(s"bad ScoreConfig entry: '$kv'")
      }
    })
}
