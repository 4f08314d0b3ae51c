package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every implemented operator has a `queries` entry; every SQL-expressible one
  * also has a DuckDB oracle in `oracleSql` with matching column aliases.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.capex.CapexDerive.pipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.E analytics headliners
    "q1_agg"         -> (Analytics.q1Agg _),
    "q3_join"        -> (Analytics.q3Join _),
    "q5_multijoin"   -> (Analytics.q5MultiJoin _),
    "q6_filter"      -> (Analytics.q6Filter _),
    "q1_rollup"      -> (Analytics.q1Rollup _),
    "topk_per_group" -> (Analytics.topkPerGroup _),
    // §2.E events + streaming batch mirrors
    "events_json"       -> (Events.eventsJson _),
    "stream_window_agg" -> (Events.streamWindowAgg _),
    "stream_sessionize" -> (Events.streamSessionize _),
    "events_rolling"    -> (Events.eventsRolling _),
    "hop_window_agg"    -> (Events.hopWindowAgg _),
    "agg_incremental"   -> (Events.aggIncremental _),
    "scd2_intervals"    -> (Events.scd2Intervals _),
    // §2.E8-E11 temporal / interval / skew-safe relational operators
    "asof_join"        -> (Temporal.asofJoinQ _),
    "range_join_bands" -> (Temporal.rangeJoinBands _),
    "distinct_users_skewsafe" -> (Temporal.distinctUsersSkewsafe _),
    "distinct_user_digest" -> (Temporal.distinctUserDigest _),
    "events_salted_join"   -> (Temporal.eventsSaltedJoin _),
    "skew_report"          -> (Temporal.skewReport _),
    "session_overlap"      -> (Temporal.sessionOverlap _),
    "embed_reduce"         -> (graft.llm.Ann.embedReduce _),
    // HLL sketch twin of distinct_users_skewsafe: estimates are
    // implementation-defined → rows-only driver check; error bound vs the
    // exact operator is spec-asserted (AnalyticsSpec)
    "distinct_users_approx" -> (Temporal.distinctUsersApprox _),
    "ann_lsh_multiprobe"   -> (graft.llm.Ann.annLshMultiprobe _),
    "price_quantiles"  -> (Analytics.priceQuantiles _),
    // sketch twin of price_quantiles: no DuckDB oracle by design (the
    // sketch's picks are implementation-defined) → driver rows-only check;
    // error bounds vs the exact operator are spec-asserted (AnalyticsSpec)
    "price_quantiles_approx" -> (Analytics.priceQuantilesApprox _),
    // §2.D LLM-training-data operators
    "dedup_exact"         -> (graft.llm.Dedup.dedupExact _),
    "dedup_minhash"       -> (graft.llm.Dedup.dedupMinhash _),
    "dedup_simhash"       -> (graft.llm.Dedup.dedupSimhash _),
    "dedup_ngram_jaccard" -> (graft.llm.Dedup.dedupNgramJaccard _),
    "dedup_embedding"     -> (graft.llm.Ann.dedupEmbedding _),
    "ann_bruteforce"      -> (graft.llm.Ann.annBruteforce _),
    "ann_lsh"             -> (graft.llm.Ann.annLsh _),
    "ann_ivf"             -> (graft.llm.Ann.annIvf _),
    "text_langid"         -> (graft.llm.TextOps.textLangid _),
    "text_quality"        -> (graft.llm.TextOps.textQuality _),
    "text_tokens"         -> (graft.llm.TextOps.textTokens _),
    "text_fingerprint"    -> (graft.llm.TextOps.textFingerprint _),
    "mm_pipeline"         -> (graft.llm.Multimodal.mmPipeline _),
    "mm_resize"           -> (graft.llm.Multimodal.mmResize _),
    "mm_frame_sample"     -> (graft.llm.Multimodal.mmFrameSample _),
    "sample_stratified"   -> (graft.llm.Sampling.sampleStratified _),
    "embed_centroids"     -> (graft.llm.Ann.embedCentroids _),
    "embed_kmeans"        -> (graft.llm.Ann.embedKmeans _),
    "dedup_semantic"      -> (graft.llm.Ann.dedupSemantic _),
    "text_lm_score"       -> (graft.llm.TextOps.textLmScore _),
    "split_holdout"       -> (graft.llm.Sampling.splitHoldout _),
    "text_tfidf"          -> (graft.llm.TextOps.textTfidf _),
    "text_repetition"     -> (graft.llm.TextOps.textRepetition _),
    "text_redact_pii"     -> (graft.llm.TextOps.textRedactPii _),
    "pack_sequences"      -> (graft.llm.Packing.packSequences _),
    "dedup_components"    -> (graft.llm.Dedup.dedupComponents _),
    "dedup_best_rep"      -> (graft.llm.Dedup.dedupBestRep _),
    "decontaminate"       -> (graft.llm.Dedup.decontaminate _),
    "decontaminate_bloom" -> (graft.llm.Dedup.decontaminateBloom _),
    "dedup_incremental"   -> (graft.llm.Dedup.dedupIncremental _),
    "dedup_spans"         -> (graft.llm.Dedup.dedupSpans _),
    "corpus_clean"        -> (graft.llm.Corpus.corpusClean _),
    "corpus_report"       -> (graft.llm.Corpus.corpusReport _),
    "quality_tiers"       -> (graft.llm.Corpus.qualityTiers _),
    "top_docs"            -> (graft.llm.Corpus.topDocs _),
    "sample_cap_domain"   -> (graft.llm.Sampling.sampleCapDomain _),
    "corpus_mixture"      -> (graft.llm.Sampling.corpusMixture _),
    // §2.E21-E24 behavioral event analytics
    "funnel_steps"      -> (Behavior.funnelSteps _),
    "retention_cohorts" -> (Behavior.retentionCohorts _),
    "events_anomaly"    -> (Behavior.eventsAnomaly _),
    "events_throttle"   -> (Behavior.eventsThrottle _),
    "merge_upsert"      -> (Merge.mergeUpsert _),
    "events_winsorize"  -> (Behavior.eventsWinsorize _),
    "events_gap_fill"   -> (Events.eventsGapFill _),
    "events_twap"       -> (Events.eventsTwap _),
    "unpivot_lineitem"  -> (Analytics.unpivotLineitem _),
    // §2.D34-D36 + D20c embedding/corpus extensions
    "contamination_frac" -> (graft.llm.Dedup.contaminationFrac _),
    "embed_quantize"     -> (graft.llm.Ann.embedQuantize _),
    "embed_knn_classify" -> (graft.llm.Ann.embedKnnClassify _),
    "text_ngram_freq"    -> (graft.llm.TextOps.textNgramFreq _),
    "source_overlap"     -> (graft.llm.Corpus.sourceOverlap _),
  ) ++ graft.capex.CapexQueries.queries

  /** DuckDB equivalents for the driver's correctness gate — every query,
    * including ann_lsh (its hyperplanes are code-time deterministic, so the
    * oracle recomputes the same buckets).
    */
  def oracleSql: Map[String, String] = Map(
    "ann_lsh"        -> graft.llm.Ann.annLshSql,
    "ann_ivf"        -> graft.llm.Ann.annIvfSql,
    "q1_agg"         -> Analytics.q1AggSql,
    "q3_join"        -> Analytics.q3JoinSql,
    "q5_multijoin"   -> Analytics.q5MultiJoinSql,
    "q6_filter"      -> Analytics.q6FilterSql,
    "topk_per_group" -> Analytics.topkPerGroupSql,
    "events_json"       -> Events.eventsJsonSql,
    "stream_window_agg" -> Events.streamWindowAggSql,
    "stream_sessionize" -> Events.streamSessionizeSql,
    "events_rolling"    -> Events.eventsRollingSql,
    "hop_window_agg"    -> Events.hopWindowAggSql,
    "agg_incremental"   -> Events.aggIncrementalSql,
    "scd2_intervals"    -> Events.scd2IntervalsSql,
    "asof_join"        -> Temporal.asofJoinSql,
    "range_join_bands" -> Temporal.rangeJoinBandsSql,
    "distinct_users_skewsafe" -> Temporal.distinctUsersSkewsafeSql,
    "distinct_user_digest" -> Temporal.distinctUserDigestSql,
    "events_salted_join"   -> Temporal.eventsSaltedJoinSql,
    "skew_report"          -> Temporal.skewReportSql,
    "session_overlap"      -> Temporal.sessionOverlapSql,
    "embed_reduce"         -> graft.llm.Ann.embedReduceSql,
    "ann_lsh_multiprobe"   -> graft.llm.Ann.annLshMultiprobeSql,
    "price_quantiles"  -> Analytics.priceQuantilesSql,
    "dedup_exact"         -> graft.llm.Dedup.dedupExactSql,
    "dedup_minhash"       -> graft.llm.Dedup.dedupMinhashSql,
    "dedup_simhash"       -> graft.llm.Dedup.dedupSimhashSql,
    "dedup_ngram_jaccard" -> graft.llm.Dedup.dedupNgramJaccardSql,
    "dedup_embedding"     -> graft.llm.Ann.dedupEmbeddingSql,
    "ann_bruteforce"      -> graft.llm.Ann.annBruteforceSql,
    "text_langid"         -> graft.llm.TextOps.textLangidSql,
    "text_quality"        -> graft.llm.TextOps.textQualitySql,
    "text_tokens"         -> graft.llm.TextOps.textTokensSql,
    "text_fingerprint"    -> graft.llm.TextOps.textFingerprintSql,
    "mm_pipeline"         -> graft.llm.Multimodal.mmPipelineSql,
    "mm_resize"           -> graft.llm.Multimodal.mmResizeSql,
    "mm_frame_sample"     -> graft.llm.Multimodal.mmFrameSampleSql,
    "sample_stratified"   -> graft.llm.Sampling.sampleStratifiedSql,
    "embed_centroids"     -> graft.llm.Ann.embedCentroidsSql,
    "embed_kmeans"        -> graft.llm.Ann.embedKmeansSql,
    "dedup_semantic"      -> graft.llm.Ann.dedupSemanticSql,
    "text_lm_score"       -> graft.llm.TextOps.textLmScoreSql,
    "split_holdout"       -> graft.llm.Sampling.splitHoldoutSql,
    "text_tfidf"          -> graft.llm.TextOps.textTfidfSql,
    "text_repetition"     -> graft.llm.TextOps.textRepetitionSql,
    "text_redact_pii"     -> graft.llm.TextOps.textRedactPiiSql,
    "pack_sequences"      -> graft.llm.Packing.packSequencesSql,
    "dedup_components"    -> graft.llm.Dedup.dedupComponentsSql,
    "dedup_best_rep"      -> graft.llm.Dedup.dedupBestRepSql,
    "decontaminate"       -> graft.llm.Dedup.decontaminateSql,
    "decontaminate_bloom" -> graft.llm.Dedup.decontaminateBloomSql,
    "dedup_incremental"   -> graft.llm.Dedup.dedupIncrementalSql,
    "dedup_spans"         -> graft.llm.Dedup.dedupSpansSql,
    "corpus_clean"        -> graft.llm.Corpus.corpusCleanSql,
    "corpus_report"       -> graft.llm.Corpus.corpusReportSql,
    "quality_tiers"       -> graft.llm.Corpus.qualityTiersSql,
    "top_docs"            -> graft.llm.Corpus.topDocsSql,
    "sample_cap_domain"   -> graft.llm.Sampling.sampleCapDomainSql,
    "corpus_mixture"      -> graft.llm.Sampling.corpusMixtureSql,
    "q1_rollup"           -> Analytics.q1RollupSql,
    "funnel_steps"        -> Behavior.funnelStepsSql,
    "retention_cohorts"   -> Behavior.retentionCohortsSql,
    "events_anomaly"      -> Behavior.eventsAnomalySql,
    "events_throttle"     -> Behavior.eventsThrottleSql,
    "merge_upsert"        -> Merge.mergeUpsertSql,
    "events_winsorize"    -> Behavior.eventsWinsorizeSql,
    "events_gap_fill"     -> Events.eventsGapFillSql,
    "events_twap"         -> Events.eventsTwapSql,
    "unpivot_lineitem"    -> Analytics.unpivotLineitemSql,
    "contamination_frac"  -> graft.llm.Dedup.contaminationFracSql,
    "embed_quantize"      -> graft.llm.Ann.embedQuantizeSql,
    "embed_knn_classify"  -> graft.llm.Ann.embedKnnClassifySql,
    "text_ngram_freq"     -> graft.llm.TextOps.textNgramFreqSql,
    "source_overlap"      -> graft.llm.Corpus.sourceOverlapSql,
  ) ++ graft.capex.CapexQueries.oracleSql
}
