package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate-pair evaluation operators (SURVEY §2 A20/A21):
  *
  *  - [[thresholdCurve]]: per-threshold precision/recall/F1 over scored
  *    candidate pairs — the reference's SimilarityMeasureEvaluation
  *    (R:.../deduplication/SimilarityMeasureEvaluation.scala emits a
  *    `sim_measure_stats` table of (threshold, precision, recall, fscore));
  *    used to tune the verify threshold τ.
  *  - [[weightedScore]]: configurable multi-measure score fold — the
  *    reference's DuplicateCandidates combines per-attribute similarity
  *    measures under ScoreConfig weights into one candidate score
  *    (R:.../deduplication/DuplicateCandidates.scala + models/ScoreConfig).
  *
  * Everything is integer (milli-units, integer division) so the DuckDB
  * oracle reproduces results bit-for-bit; at 10^12 scale both are one
  * groupBy over the (already small) candidate-pair table.
  */
object Evaluation {

  /** Per-threshold confusion stats + P/R/F1 (milli-units).
    *
    * @param scored candidate pairs with an integer `score_millis` column
    *               and a boolean `gold` column (ground truth / oracle label)
    * @param steps  number of threshold buckets; thresholds are
    *               0, 1000/steps, ..., 1000 (inclusive)
    * @return (thresh_millis, tp, fp, fn, precision_millis, recall_millis,
    *         f1_millis) — one row per threshold, integer-only
    */
  def thresholdCurve(scored: DataFrame, steps: Int = 10): DataFrame = {
    val pred = col("score_millis") >= col("thresh_millis")
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    scored
      .select(col("score_millis"), col("gold"),
        explode(sequence(lit(0L), lit(steps.toLong))).as("t"))
      // per-bucket division (not a pre-truncated step) so the top threshold
      // is exactly 1000 even when steps does not divide 1000
      .withColumn("thresh_millis", expr(s"(t * 1000) div $steps"))
      .groupBy("thresh_millis")
      .agg(
        cnt(col("gold") && pred).as("tp"),
        cnt(!col("gold") && pred).as("fp"),
        cnt(col("gold") && !pred).as("fn"))
      .withColumn("precision_millis",
        when(col("tp") + col("fp") > 0,
          expr("(tp * 1000) div (tp + fp)")).otherwise(0L))
      .withColumn("recall_millis",
        when(col("tp") + col("fn") > 0,
          expr("(tp * 1000) div (tp + fn)")).otherwise(0L))
      .withColumn("f1_millis",
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          expr("(tp * 2000) div (2 * tp + fp + fn)")).otherwise(0L))
  }

  /** Weighted mean of per-measure milli-scores under a [[ScoreConfig]]:
    * score_millis = Σ w_i · m_i  div  Σ w_i. Expects one integer
    * milli-valued column per configured measure name (integer division —
    * exact, oracle-reproducible). */
  def weightedScore(df: DataFrame, config: graft.config.ScoreConfig): DataFrame = {
    val num = config.weights
      .map { case (m, w) => s"$m * ${w}" }.mkString(" + ")
    val den = config.weights.map(_._2).sum
    require(den > 0, "ScoreConfig weights must sum to a positive value")
    df.withColumn("score_millis", expr(s"($num) div $den"))
  }
}
