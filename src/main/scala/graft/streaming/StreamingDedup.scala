package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.GraftExpressions

/** Structured Streaming dedup operators.
  *
  * The reference is strictly batch (SURVEY §2 A41 — RDD jobs chained via
  * Cassandra tables), so nothing here has a reference counterpart; it
  * exists so the engine covers the streaming-ingest shape a training-data
  * pipeline needs: dropping exact/near duplicates as documents arrive.
  *
  * Both operators are plan transformations (readStream → transform →
  * writeStream is the caller's choice of source/sink):
  *  - exact dedup: watermarked `dropDuplicates` on the content fingerprint —
  *    Spark keeps one state row per fingerprint inside the watermark.
  *  - near-dup candidate stream: stateless signature/band derivation; the
  *    banded stream joined against a static signature table flags arrivals
  *    that collide with the existing corpus (stream-static join — no state
  *    explosion; the corpus side is the batch engine's band table).
  */
object StreamingDedup {

  /** Exact-duplicate removal on a stream of (idCol, textCol, tsCol):
    * keeps the first arrival per normalized-text fingerprint within the
    * watermark window.
    *
    * State is BOUNDED: `dropDuplicatesWithinWatermark` expires a
    * fingerprint's state row once the watermark passes its event time, so a
    * long-running stream holds only the fingerprints of the active window
    * (plain `dropDuplicates("fp")` would keep one state row per fingerprint
    * forever — the event-time column is not part of the dedup key, so the
    * watermark never cleans it). A re-arrival AFTER expiry is treated as a
    * new document — the correct semantics for a dedup window. */
  def dropExactDuplicates(stream: DataFrame, idCol: String, textCol: String,
                          tsCol: String, watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fp", GraftExpressions.strHash(lower(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** One LSH band-bucket row of the arriving stream. */
  private[streaming] case class BandRow(band_idx: Long, band_hash: Long, id: String)

  /** Stateful WITHIN-stream near-dup detection: arriving docs are MinHash-
    * banded; per band bucket a `GroupState` remembers the ids seen so far
    * (custom state via `flatMapGroupsWithState` — the KeyValueGroupedDataset
    * state path), and an arrival colliding with remembered ids emits one
    * (a, b) row per collision. Downstream exact verification is the batch
    * engine's verify ladder, same as the static-corpus variant.
    *
    * State is bounded twice: a processing-time timeout evicts idle buckets,
    * and `maxPerBucket` caps the remembered ids per bucket (the streaming
    * analog of the salting cap — a viral bucket emits pairs against the
    * first `maxPerBucket` members instead of growing state quadratically).
    *
    * Output contract: AT-LEAST-ONCE per candidate pair, exactly as for any
    * streaming candidate generator feeding a verify stage —
    *  (a) a pair whose signatures collide in MULTIPLE bands is emitted once
    *      per colliding band (the batch [[graft.operators.MinHashLsh
    *      .candidatePairs]] dedups across bands; a stream cannot coordinate
    *      across band-bucket state cheaply);
    *  (b) an id arriving at a FULL bucket (>= maxPerBucket members) emits
    *      its pairs but is not remembered, so its re-arrival in a later
    *      microbatch re-emits the same pairs (remembering evicted ids would
    *      unbound the state the cap exists to bound).
    * Downstream must treat (a, b) idempotently — the batch verify ladder
    * does (`dropDuplicates("a","b")` precedes it), as does any sink keyed
    * by (a, b). */
  def nearDupWithinStream(stream: DataFrame, idCol: String, textCol: String,
                          maxPerBucket: Int = 64,
                          stateTimeout: String = "30 minutes"): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bands = graft.operators.MinHashLsh.bands(
        graft.operators.MinHashLsh.signaturesFromText(stream, idCol, textCol))
      .select(col("band_idx"), col("band_hash"), col("id").cast("string").as("id"))
      .as[BandRow]
    bands
      .groupByKey(r => (r.band_idx, r.band_hash))
      .flatMapGroupsWithState[Seq[String], (String, String)](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (_: (Long, Long), rows: Iterator[BandRow], state: GroupState[Seq[String]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var seen = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[(String, String)]
            rows.foreach { r =>
              if (!seen.contains(r.id)) {
                seen.foreach(s =>
                  out += (if (s < r.id) (s, r.id) else (r.id, s)))
                if (seen.size < maxPerBucket) seen = seen :+ r.id
              }
            }
            state.update(seen)
            state.setTimeoutDuration(stateTimeout)
            out.result().iterator
          }
      }
      .toDF("a", "b")
  }

  /** Streams LSH band collisions of arriving docs against a static corpus
    * band table (columns: id, band_idx, band_hash) — the streaming front
    * door to the batch near-dup pipeline. Stateless (stream-static inner
    * join): emits one row per (arriving doc, colliding corpus doc, band);
    * downstream dedup/verify is the batch engine's job. */
  def nearDupAgainstCorpus(stream: DataFrame, corpusBands: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val bands = graft.operators.MinHashLsh.bands(
      graft.operators.MinHashLsh.signatures(
        graft.operators.MinHashLsh.shingleTable(stream, idCol, textCol)))
    bands.join(
        corpusBands.select(col("band_idx"), col("band_hash"),
          col("id").as("corpus_id")),
        Seq("band_idx", "band_hash"))
      .where(col("id") =!= col("corpus_id"))
      .select(col("id"), col("corpus_id"), col("band_idx"))
  }

  /** [[nearDupAgainstCorpus]] against the batch engine's DURABLE corpus
    * artifact: the folded `(bucket, id)` band snapshot that
    * [[graft.pipeline.IncrementalImageDedup]] stages as
    * `inc_corpus_bands` — streaming ingest and batch delta imports share
    * one corpus-side table, so refreshing the snapshot after an import
    * also refreshes what the stream collides against. Stateless
    * stream-static join on the single long bucket key. */
  def nearDupAgainstCorpusSnapshot(stream: DataFrame, foldedCorpusBands: DataFrame,
                                   idCol: String, textCol: String): DataFrame = {
    val bands = graft.operators.MinHashLsh.bands(
        graft.operators.MinHashLsh.signatures(
          graft.operators.MinHashLsh.shingleTable(stream, idCol, textCol)))
      .select(col("id"),
        (col("band_idx") * lit(graft.config.GoldenConfig.P) + col("band_hash")).as("bucket"))
    bands.join(
        foldedCorpusBands.select(col("bucket"), col("id").as("corpus_id")),
        Seq("bucket"))
      .where(col("id") =!= col("corpus_id"))
      .select(col("id"), col("corpus_id"), col("bucket"))
  }

  /** Watermark-bounded TUMBLING-WINDOW ingest metrics — the windowed-agg
    * face of the streaming surface next to the stateful dedup operators:
    * per event-time window, arriving rows and (HLL-approximate) distinct
    * ids. The watermark both bounds the aggregation state and, in Append
    * mode, finalizes windows — exactly the monitoring feed a production
    * ingest job emits alongside the dedup stream. `approx_count_distinct`
    * because exact distinct is unbounded state in streaming (and the
    * metric is a gauge, not a correctness output). */
  def windowedIngestStats(stream: DataFrame, tsCol: String, idCol: String,
                          windowDur: String = "1 minute",
                          watermark: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_rows"),
        approx_count_distinct(col(idCol)).as("n_ids_approx"))
      .select(col("window.start").as("window_start"),
        col("n_rows"), col("n_ids_approx"))
}
