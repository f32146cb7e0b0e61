package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.GoldenConfig._
import graft.operators.{MinHashLsh, SkewSalting, ConnectedComponents}

/** Incremental (delta-vs-corpus) image dedup — the production shape of the
  * reference's staging-vs-master import (R:.../deduplication/Blocking.scala
  * blocks a staging table against the subject master table; SURVEY §2 A11):
  * assign a NEW batch of rows into an already-clustered 10^12-row corpus
  * without ever re-pairing the corpus against itself.
  *
  * Work shape at scale (the reason this exists):
  *  - corpus-side computation is LINEAR scans only — the annotation window
  *    pass and the shingle/band/gram/chunk tables. All of them are staged
  *    through the [[StageStore]] under corpus-keyed names, so with a durable
  *    store (parquet dir / Iceberg catalog) they are computed once and
  *    REUSED by every subsequent import of the same corpus snapshot; a
  *    daily-delta run then touches the corpus only through pruned joins.
  *  - every quadratic candidate join has the delta on one side:
  *    [[SkewSalting.crossJoinPairs]] drops corpus buckets with no delta row
  *    map-side (bloom over pairable keys), so the shuffle volume tracks the
  *    DELTA's bucket footprint, not the corpus's.
  *  - delta-internal duplicates are found by the same self-join path as the
  *    full pipeline, on the (small) delta only.
  *
  * Semantics: identical duplicate criterion as [[ImageDedupPipeline]] (one
  * shared verify ladder). Output clusters = connected components over
  *   prior corpus cluster edges ∪ verified (corpus×delta ∪ delta×delta)
  *   edges ∪ exact-dup edges,
  * so a delta row can also BRIDGE two previously-separate corpus clusters —
  * matching what a full re-run over corpus ∪ delta would produce for every
  * pair involving a delta row. (Corpus-internal pairs the prior run did not
  * emit are intentionally not re-derived — that is the incremental
  * contract.) Requires image_id values distinct across corpus and delta.
  */
object IncrementalImageDedup {

  /** Bench/test run without durable snapshots: multiply-consumed stages are
    * lazily localCheckpoint'ed, the rest stay lazy plans. */
  def runDirect(spark: SparkSession, corpus: DataFrame, corpusClusters: DataFrame,
                delta: DataFrame): DataFrame =
    run(spark, corpus, corpusClusters, delta, new StageStore {
      def stage(name: String)(compute: => DataFrame): DataFrame =
        if (name == "inc_clusters") compute else compute.localCheckpoint(false)
    })

  /** @param corpus         full prior table (input_hint schema)
    * @param corpusClusters (image_id, cluster_id) from the prior run
    * @param delta          new rows (input_hint schema)
    * @return (image_id, cluster_id) for every corpus AND delta row */
  def run(spark: SparkSession, corpus: DataFrame, corpusClusters: DataFrame,
          delta: DataFrame, ckpt: StageStore): DataFrame = {

    // ---- per-side annotation (corpus side reusable across imports) ----
    val annC = ckpt.stage("inc_corpus_annotated")(ImageDedupPipeline.annotate(corpus))
    val annD = ckpt.stage("inc_delta_annotated")(ImageDedupPipeline.annotate(delta))
    val repsC = annC.where(col("image_id") === col("rep"))
    val repsD = annD.where(col("image_id") === col("rep"))
    val capRepsC = annC.where(col("image_id") === col("cid")).select(col("cid"), col("caption"))
    val capRepsD = annD.where(col("image_id") === col("cid")).select(col("cid"), col("caption"))
    val starD = annD.where(col("image_id") =!= col("rep"))
      .select(col("rep").as("a"), col("image_id").as("b"))
    val memberC = repsC.select(col("cid"), col("image_id"))
    val memberD = repsD.select(col("cid"), col("image_id"))

    val shC = ckpt.stage("inc_corpus_shingles")(ImageDedupPipeline.shingleGramTable(capRepsC))
    val shD = ckpt.stage("inc_delta_shingles")(ImageDedupPipeline.shingleGramTable(capRepsD))

    // ---- caption-level candidates (cid, cid) ----
    def bandsOf(capReps: DataFrame) = MinHashLsh.bands(
      MinHashLsh.signaturesFromText(capReps, "cid", "caption"))
    def gramsOf(capReps: DataFrame) = capReps.select(col("cid").as("id"),
        explode(graft.functions.GraftExpressions.gramHashes(
          graft.functions.TextHash.tokens(col("caption")), SubstringL)).as("gram_hash"))
      .distinct()

    val capCross = ckpt.stage("inc_cap_cross_pairs") {
      MinHashLsh.candidatePairsAgainst(bandsOf(capRepsC), bandsOf(capRepsD))
        .unionByName(SkewSalting.crossJoinPairs(gramsOf(capRepsC), gramsOf(capRepsD),
          Seq("gram_hash"), "id", SaltCap, SaltFanout))
    }
    val capSelfD = ckpt.stage("inc_cap_delta_pairs") {
      MinHashLsh.candidatePairs(bandsOf(capRepsD))
        .unionByName(SkewSalting.selfJoinPairs(gramsOf(capRepsD),
          Seq("gram_hash"), "id", SaltCap, SaltFanout))
    }

    // expand (cid_a, cid_b) → exact-class rep pairs; cross keeps
    // (a = corpus id, b = delta id), delta-self orders a < b
    val crossRows = capCross
      .join(memberC.select(col("cid").as("a"), col("image_id").as("ia")), "a")
      .join(memberD.select(col("cid").as("b"), col("image_id").as("ib")), "b")
      .select(col("ia").as("a"), col("ib").as("b"))
    val selfRowsD = capSelfD
      .join(memberD.select(col("cid").as("a"), col("image_id").as("ia")), "a")
      .join(memberD.select(col("cid").as("b"), col("image_id").as("ib")), "b")
      .select(least(col("ia"), col("ib")).as("a"), greatest(col("ia"), col("ib")).as("b"))

    // ---- image candidates: phash chunks within caption groups. Cross
    // buckets key on the caption STRING hash (per-side cids are not
    // comparable); delta-self keys on the cheaper long cid like the full
    // pipeline.
    val phCross = SkewSalting.crossJoinPairs(
      ImageDedupPipeline.phashChunks(repsC, col("caption")),
      ImageDedupPipeline.phashChunks(repsD, col("caption")),
      Seq("bucket"), "id", SaltCap, SaltFanout)
    val phSelfD = SkewSalting.selfJoinPairs(
      ImageDedupPipeline.phashChunks(repsD, col("cid")),
      Seq("bucket"), "id", SaltCap, SaltFanout)

    // ---- ONE verify ladder over all candidates, with per-side metadata
    // unioned (ids are globally unique) ----
    val verified = ckpt.stage("inc_verified_edges") {
      val cand = crossRows.unionByName(selfRowsD)
        .unionByName(phCross).unionByName(phSelfD)
        .dropDuplicates("a", "b")
      val capt = repsC.unionByName(repsD)
        .select(col("image_id"), col("caption"), col("bytes_hash"), col("phash"))
      val shByRow = memberC
        .join(shC.select(col("id").as("cid"), col("shingles"), col("grams")), "cid")
        .unionByName(memberD
          .join(shD.select(col("id").as("cid"), col("shingles"), col("grams")), "cid"))
        .select(col("image_id"), col("shingles"), col("grams"))
        .localCheckpoint(false)
      val bytesTbl = corpus.select(col("image_id"), col("bytes"))
        .unionByName(delta.select(col("image_id"), col("bytes")))
      ImageDedupPipeline.verifyLadder(cand, capt, shByRow, bytesTbl)
    }

    // exact cross dups short-circuit the ladder: identical (caption,
    // bytes_hash) class reps on the two sides are duplicates by definition
    val exactCross = repsC.select(col("caption"), col("bytes_hash"), col("image_id").as("a"))
      .join(repsD.select(col("caption"), col("bytes_hash"), col("image_id").as("b")),
        Seq("caption", "bytes_hash"))
      .select(col("a"), col("b"))

    // ---- clusters: prior corpus assignment becomes edges; CC unions in
    // everything the delta introduced ----
    ckpt.stage("inc_clusters") {
      val corpusEdges = corpusClusters.where(col("image_id") =!= col("cluster_id"))
        .select(col("cluster_id").as("a"), col("image_id").as("b"))
      val edges = verified.select("a", "b")
        .unionByName(starD).unionByName(exactCross).unionByName(corpusEdges)
      val ids = corpus.select(col("image_id").as("id"))
        .unionByName(delta.select(col("image_id").as("id")))
      ConnectedComponents.run(spark, edges, Some(ids), store = Some(ckpt))
        .select(col("id").as("image_id"), col("cluster_id"))
    }
  }
}
