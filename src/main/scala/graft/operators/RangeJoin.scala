package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — "which intervals contain this point"
  * at corpus scale. Spark plans a raw `l.k = r.k AND p >= s AND p < e`
  * join as a per-key cartesian (every point × every interval of the key
  * before the filter — quadratic on hot keys); the bucketed form chunks
  * the time axis at granularity ≥ the longest interval, explodes each
  * interval to the ≤ 2 chunks it can overlap, and equi-joins on
  * (key, chunk) — so the shuffle is keyed, bounded (≤ 2 rows per
  * interval), and the exact `[start, end)` predicate only filters rows
  * that already share a chunk. This is the same plan shape Databricks'
  * range-join optimization and Flink's interval join produce.
  *
  * Semantics are half-open `start <= point < end`, pinned for
  * cross-engine exactness. All times are integer epoch micros.
  */
object RangeJoin {

  /** @param points    (pointKey, pointTime, ...) probe side
    * @param intervals (intervalKey, startCol, endCol, ...) build side
    * @param chunk     bucket width in the time unit; MUST be ≥ every
    *                  interval length (enforced), so an interval spans at
    *                  most 2 chunks
    * @return all columns of both sides for each (point ∈ interval) match */
  def pointInInterval(points: DataFrame, pointKey: String, pointTime: String,
                      intervals: DataFrame, intervalKey: String,
                      startCol: String, endCol: String, chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    val p = points.withColumn("_chunk", floorDiv(col(pointTime).cast("long"), chunk))
    // fail loud (map-side assert, no extra scan) rather than silently
    // losing matches from an interval spanning 3+ chunks
    val iv = intervals.withColumn("_chunks", when(
          assert_true(col(endCol).cast("long") - col(startCol).cast("long") <= chunk,
            lit(s"interval longer than chunk=$chunk - matches would be lost")).isNull,
          array_distinct(array(floorDiv(col(startCol).cast("long"), chunk),
            // end is exclusive: the last covered chunk holds end-1
            floorDiv(col(endCol).cast("long") - 1, chunk)))))
      .withColumn("_chunk", explode(col("_chunks"))).drop("_chunks")
    // side-qualified references throughout (round-5 ADVICE low): a caller
    // passing the same column NAME for both sides would otherwise hit an
    // ambiguous-reference AnalysisException on the key/time predicates
    p.join(iv, p("_chunk") === iv("_chunk") &&
        p(pointKey) === iv(intervalKey) &&
        p(pointTime).cast("long") >= iv(startCol).cast("long") &&
        p(pointTime).cast("long") < iv(endCol).cast("long"))
      .drop("_chunk")
  }

  /** Floor division for possibly-negative epoch values (Spark's `div`
    * truncates toward zero; chunk ids must floor so negatives bucket
    * consistently with DuckDB's `//`). */
  private def floorDiv(a: Column, b: Long): Column =
    call_function("div", a - pmod(a, lit(b)), lit(b))
}
