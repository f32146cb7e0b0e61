package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for LLM training-data assembly: the standard
  * concat-and-chunk policy (documents concatenated in a deterministic
  * order, the token stream cut into fixed-length context windows) mapped
  * to each document's [start, end] chunk range. Downstream writers use it
  * to group documents per training sequence and to locate boundary
  * documents that straddle two chunks.
  *
  * Determinism: the stream order is (idCol ascending) — layout-independent
  * like everything in [[Sampling]], so the same corpus packs identically
  * on any cluster shape, any day.
  *
  * Scale shape — the naive formulation is a running sum over the WHOLE
  * corpus (`Window.orderBy(id)` with no partition key = every row through
  * ONE task). Instead the prefix sum is two-level with BOUNDED partitions,
  * the same pattern as `Sampling.stratifiedTopKByThreshold`:
  *   1. rows bucket by `id div bucketWidth`; per-bucket token sums are one
  *      map-side-combining groupBy (one partial row per map task);
  *   2. bucket offsets = running sum over the BUCKET table (corpus/width
  *      rows — metadata-scale, its window partition is the bucket table,
  *      not the corpus);
  *   3. each row's offset = its bucket's offset + a running sum within
  *      the bucket (window partition ≤ bucketWidth ids).
  *
  * Output: (id, n_tokens, offset, chunk_first, chunk_last) where
  * offset = tokens before this document in the stream,
  * chunk_first/last = offset div ctxLen / (offset + n_tokens − 1) div
  * ctxLen (empty documents take chunk_first = chunk_last = the chunk of
  * their offset).
  */
object Packing {

  def sequencePack(df: DataFrame, idCol: String, tokensCol: String,
                   ctxLen: Long, bucketWidth: Long = 1L << 16): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val rows = df.select(col(idCol).as("id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("_bkt", expr(s"id div $bucketWidth"))
      .localCheckpoint(false) // consumed by the bucket agg AND the final join
    // 1. per-bucket sums (map-side combining)
    val bucketSums = rows.groupBy("_bkt").agg(sum("n_tokens").as("_bsum"))
    // 2. running offsets over the bucket table (corpus/bucketWidth rows)
    val wB = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    val bucketOffsets = bucketSums
      .withColumn("_boff", coalesce(sum("_bsum").over(wB), lit(0L)))
      .select("_bkt", "_boff")
    // 3. within-bucket running sum (partition ≤ bucketWidth ids) + chunks
    val wIn = Window.partitionBy("_bkt").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(bucketOffsets, Seq("_bkt"))
      .withColumn("tok_offset", col("_boff") + coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .withColumn("chunk_first", expr(s"tok_offset div $ctxLen"))
      .withColumn("chunk_last",
        expr(s"greatest(tok_offset, tok_offset + n_tokens - 1) div $ctxLen"))
      .select("id", "n_tokens", "tok_offset", "chunk_first", "chunk_last")
  }

  /** The single-window reference formulation (whole corpus through one
    * window task) — kept for the property spec only. */
  private[graft] def sequencePackWindow(df: DataFrame, idCol: String,
                                        tokensCol: String, ctxLen: Long): DataFrame = {
    val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("tok_offset", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("chunk_first", expr(s"tok_offset div $ctxLen"))
      .withColumn("chunk_last",
        expr(s"greatest(tok_offset, tok_offset + n_tokens - 1) div $ctxLen"))
      .select("id", "n_tokens", "tok_offset", "chunk_first", "chunk_last")
  }
}
