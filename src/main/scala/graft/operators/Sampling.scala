package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.config.GoldenConfig.{P, LcgMul, LcgAddA}

/** Deterministic sampling for training-data pipelines. Spark's built-in
  * `df.sample` is seed-deterministic only per partitioning — a repartition
  * or a different file split changes which rows survive, which is
  * unacceptable for reproducible corpus builds. Both operators here hash
  * the ROW KEY with the engine's pinned LCG, so the same row always makes
  * the same decision on any cluster layout, any partition count, any day.
  *
  * Scale shape: [[bernoulli]] is a pure map-side filter (no shuffle, no
  * state); [[stratifiedTopK]] is one hash-partitioned window per stratum —
  * the same shape as the exact-dedup keeper window, with the same skew
  * caveat (a viral stratum lands in one window task; cap strata sizes
  * upstream or salt if a stratum can be a significant fraction of the
  * input).
  */
object Sampling {

  /** Pinned per-row sampling key in [0, P): the LCG step of the numeric id,
    * with the id reduced mod P FIRST so the multiply never exceeds
    * ~2.4e18 < Long.Max for any id (ANSI mode throws on overflow — an
    * unreduced 10^12-scale id would crash here). Reproducible in ANSI SQL
    * (the DuckDB oracle runs the same integers). */
  def sampleKey(id: Column, seed: Long = 0L): Column =
    pmod(lit(LcgMul) * pmod(id + lit(seed), lit(P)) + lit(LcgAddA), lit(P))

  /** Keep a row iff its sampling key lands under `rateMillis`/1000 —
    * deterministic Bernoulli(rate) independent of layout. */
  def bernoulli(df: DataFrame, idCol: String, rateMillis: Int,
                seed: Long = 0L): DataFrame = {
    require(rateMillis >= 0 && rateMillis <= 1000, "rateMillis in [0, 1000]")
    df.where(sampleKey(col(idCol), seed) % 1000L < rateMillis.toLong)
  }

  /** Exactly-k-per-stratum deterministic sample: rows ranked inside each
    * stratum by sampling key (id tiebreak), first k kept. */
  def stratifiedTopK(df: DataFrame, idCol: String, stratumCol: String,
                     k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(sampleKey(col(idCol), seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k.toLong)
  }
}
