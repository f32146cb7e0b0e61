package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Implementations live in [[Queries]]; DuckDB oracles in [[OracleSql]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * end-to-end near-duplicate clustering (MinHash→LSH→verify→CC). */
  def entry(spark: SparkSession): DataFrame =
    Queries.dedupClusters(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_token_count"    -> (Queries.tokenCount(_, _)),
    "q02_wordcount"      -> (Queries.wordCount(_, _)),
    "q03_shingle_stats"  -> (Queries.shingleStats(_, _)),
    "q04_minhash_sig"    -> (Queries.minhashSig(_, _)),
    "q05_lsh_bands"      -> (Queries.lshBands(_, _)),
    "q06_lsh_pairs"      -> (Queries.lshPairs(_, _)),
    "q07_verify_pairs"   -> (Queries.verifyPairs(_, _)),
    "q08_dedup_clusters" -> (Queries.dedupClusters(_, _)),
    "q09_exact_dedup"    -> (Queries.exactDedup(_, _)),
    "q10_simhash"        -> (Queries.simhash(_, _)),
    "q11_simhash_pairs"  -> (Queries.simhashPairs(_, _)),
    "q12_substring_pairs" -> (Queries.substringPairs(_, _)),
    "q13_fingerprint"    -> (Queries.fingerprint(_, _)),
    "q14_langid"         -> (Queries.langId(_, _)),
    "q15_quality"        -> (Queries.quality(_, _)),
    "q16_sim_measures"   -> (Queries.simMeasures(_, _)),
    "q17_ann_topk"       -> (Queries.annTopK(_, _)),
    "q18_ann_lsh_buckets" -> (Queries.annLshBuckets(_, _)),
    "q19_agg_pricing"    -> (Queries.aggPricing(_, _)),
    "q20_join_revenue"   -> (Queries.joinRevenue(_, _)),
    "q21_semi_anti"      -> (Queries.semiAnti(_, _)),
    "q22_window_topk"    -> (Queries.windowTopK(_, _)),
    "q23_setops"         -> (Queries.setOps(_, _)),
    "q24_json_events"    -> (Queries.jsonEvents(_, _)),
    "q25_blocking_stats" -> (Queries.blockingStats(_, _)),
    "q26_block_histogram" -> (Queries.blockHistogram(_, _)),
    "q27_suffix_array_pairs" -> (Queries.suffixArrayPairs(_, _)),
    "q28_threshold_curve" -> (Queries.thresholdCurve(_, _)),
    "q29_weighted_scores" -> (Queries.weightedScores(_, _)),
    "q30_blocking_schemes" -> (Queries.blockingSchemes(_, _)),
    "q31_ann_lsh_topk"   -> (Queries.annLshTopK(_, _)),
    "q32_version_history" -> (Queries.versionHistory(_, _)),
    "q33_wordcount_stemmed" -> (Queries.wordCountStemmed(_, _)),
    "q34_tfidf"          -> (Queries.tfidfVectors(_, _)),
    "q35_tfidf_cosine"   -> (Queries.tfidfCosine(_, _)),
    "q36_embedding_near_dup" -> (Queries.embeddingNearDup(_, _)),
    "q37_ann_banded_topk" -> (Queries.annBandedTopK(_, _)),
    "q38_wordcount_rich" -> (Queries.wordCountRich(_, _)),
    "q39_audio_fingerprints" -> (Queries.audioFingerprints(_, _)),
    "q40_ann_ivf_topk" -> (Queries.annIvfTopK(_, _)),
    "q41_cross_dedup_pairs" -> (Queries.crossDedupPairs(_, _)),
    "q42_cross_dedup_clusters" -> (Queries.crossDedupClusters(_, _)),
    "q43_corpus_curation" -> (Queries.corpusCuration(_, _)),
    "q44_token_bpeish" -> (Queries.tokenBpeish(_, _)),
    "q45_sample_bernoulli" -> (Queries.sampleBernoulli(_, _)),
    "q46_sample_stratified" -> (Queries.sampleStratified(_, _)),
    "q47_split_leakfree" -> (Queries.splitLeakFree(_, _)),
    "q48_pii_scrub" -> (Queries.piiScrub(_, _)),
    "q49_contamination" -> (Queries.contamination(_, _)),
    "q50_repetition" -> (Queries.repetitionScore(_, _)),
    "q51_keep_best" -> (Queries.keepBest(_, _)),
    "q52_embedding_cross_near_dup" -> (Queries.embeddingCrossNearDup(_, _)),
    "q53_balanced_mix" -> (Queries.balancedMix(_, _)),
    "q54_sessionize" -> (Queries.sessionize(_, _)),
    "q55_dup_lines" -> (Queries.dupLines(_, _)),
    "q56_url_normalize" -> (Queries.urlNormalize(_, _)),
    "q57_dedup_lines_corpus" -> (Queries.dedupLinesCorpus(_, _)),
    "q58_sequence_pack" -> (Queries.sequencePack(_, _)),
    "q59_temperature_mix" -> (Queries.temperatureMix(_, _)),
    "q60_semantic_dedup" -> (Queries.semanticDedup(_, _)),
    "q61_clean_lines" -> (Queries.cleanLinesQ(_, _)),
    "q62_vocab_coverage" -> (Queries.vocabCoverageQ(_, _)),
    "q63_dedup_spans" -> (Queries.dedupSpansQ(_, _)),
    "q64_gopher_rules" -> (Queries.gopherRulesQ(_, _)),
    "q65_sq8_ann_topk" -> (Queries.sq8AnnTopK(_, _)),
    "q66_phash_dct" -> (Queries.phashDctQ(_, _)),
    "q67_phash_pairs" -> (Queries.phashPairsQ(_, _)),
    "q68_asof_join" -> (Queries.asofJoinQ(_, _)),
    "q69_hll_registers" -> (Queries.hllRegistersQ(_, _)),
    "q70_countmin" -> (Queries.countMinQ(_, _)),
    "q71_zorder" -> (Queries.zorderQ(_, _)),
    "q72_pq_ann_topk" -> (Queries.pqAnnTopK(_, _)),
    "q73_range_join" -> (Queries.rangeJoinQ(_, _)),
    "q74_percentiles" -> (Queries.percentilesQ(_, _)),
    "q75_rrf_fusion" -> (Queries.rrfFusionQ(_, _))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
