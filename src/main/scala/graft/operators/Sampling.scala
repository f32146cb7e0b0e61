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
  * state); [[stratifiedTopK]] is a bounded top-k AGGREGATE (k-capped
  * per-partition partial state, map-side combined) + a join-back — a viral
  * stratum with m rows across p partitions shuffles ≤ k·p pairs instead of
  * landing all m rows in one window task, and the join-back's skew is
  * AQE-splittable. Property-tested row-identical to the straightforward
  * window formulation (kept as [[stratifiedTopKWindow]]).
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
    * stratum by sampling key (id tiebreak), first k kept; output = the
    * input columns plus `sample_rank` (1..k). `idCol` must be a unique
    * numeric row key (it already must be numeric for [[sampleKey]]; the
    * join-back additionally relies on uniqueness).
    *
    * Straggler-proof shape: [[graft.functions.BoundedTopKAgg]] caps
    * per-partition partial state at k pairs per stratum, so no task ever
    * holds a viral stratum whole — see the class scaladoc. */
  def stratifiedTopK(df: DataFrame, idCol: String, stratumCol: String,
                     k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, "k must be positive")
    // fail loudly instead of silently truncating: the join-back keys on
    // the id cast to long, which is only faithful for integral ids
    // (review finding — a fractional DoubleType id would alias rows)
    require(Set("long", "integer", "short", "byte")
        .contains(df.schema(idCol).dataType.typeName),
      s"stratifiedTopK needs an integral id column, got " +
        s"${df.schema(idCol).dataType.simpleString} for '$idCol'")
    val winners = df
      .select(col(stratumCol).as("_st"), sampleKey(col(idCol), seed).as("_sk"),
        col(idCol).cast("long").as("_sid"))
      .groupBy("_st")
      .agg(graft.functions.BoundedTopKAgg.boundedTopK(col("_sk"), col("_sid"), k).as("_top"))
      .select(posexplode(col("_top")))
      .select(col("col")("id").as("_sid"), (col("pos") + 1).cast("long").as("sample_rank"))
    df.join(winners, col(idCol).cast("long") === col("_sid"))
      .drop("_sid")
  }

  /** Balanced mixture: deterministically downsample every stratum (data
    * source, language, …) to the size of the SMALLEST one — the simplest
    * training-corpus mixing policy ("equal parts of every source"),
    * layout-independent like everything here. The minority size is a
    * scalar aggregate read on the driver (metadata-scale, same class of
    * decision as SkewSalting's hot-key probe); the sample itself is
    * [[stratifiedTopK]]'s straggler-proof bounded aggregate. */
  def balancedMix(df: DataFrame, idCol: String, stratumCol: String,
                  seed: Long = 0L): DataFrame = {
    val r = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("cnt"))
      .agg(min(col("cnt"))).head()
    if (r.isNullAt(0)) // empty input: empty output with the same shape
      return df.withColumn("sample_rank", lit(0L)).limit(0)
    val minCnt = r.getLong(0)
    require(minCnt <= Int.MaxValue,
      s"balancedMix: smallest stratum has $minCnt rows — beyond the Int-sized " +
        "per-stratum k of the bounded aggregate; downsample strata first")
    stratifiedTopK(df, idCol, stratumCol, minCnt.toInt, seed)
  }

  /** The one-window-per-stratum formulation of [[stratifiedTopK]] — kept as
    * the semantic reference for the property spec (row-identical output);
    * a viral stratum lands whole in one window task here. */
  private[graft] def stratifiedTopKWindow(df: DataFrame, idCol: String,
                                          stratumCol: String, k: Int,
                                          seed: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(sampleKey(col(idCol), seed), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k.toLong)
  }
}
