package graft

/** Per-query shuffle-WRITE-byte ceilings for PlanBudgetSpec's r8 volume
  * net — REGENERATED, do not hand-edit rows: run
  *   sbt 'Test/runMain graft.tools.PlanBudgetProbe /root/testdata/sf0.001' > probe.log
  *   python3 tools/gen_byte_budgets.py probe.log
  * Ceiling = spec-scale observation x 2 + 64 KiB (x 1.5 for the
  * deliberately-tight exhibits, see gen_byte_budgets.py TIGHT): the axis
  * that catches a query keeping its stage COUNT while multiplying the
  * volume it pushes through an exchange — fk_integrity's 7-join vs
  * single-scan forms differ only here.
  */
object ByteBudgets {
  val table: Map[String, Long] = Map(
    "ab_test_ztest" -> 80490L, // observed 7477
    "agg_incremental" -> 163990L, // observed 49227
    "ann_bruteforce" -> 67588L, // observed 1026
    "ann_index_multiprobe" -> 81750L, // observed 8107
    "ann_index_probe" -> 67438L, // observed 951
    "ann_int8" -> 348148L, // observed 141306
    "ann_ivf" -> 717922L, // observed 326193
    "ann_ivfadc" -> 1480078L, // observed 707271
    "ann_lsh" -> 67038L, // observed 751
    "ann_lsh_multiprobe" -> 75676L, // observed 5070
    "ann_pq" -> 1084476L, // observed 509470 (r9 salted two-phase)
    "ann_pq_opq" -> 1107754L, // observed 521109
    "ann_recall_matrix" -> 3544692L, // observed 1739578
    "ann_recall_curve" -> 95070L, // observed 14767
    "ann_recall_report" -> 69090L, // observed 1777
    "append_region_comment" -> 899060L, // observed 416762
    "asof_join" -> 84240L, // observed 9352
    "basket_pairs" -> 94260L, // observed 14362
    "bpe_coverage" -> 473626L, // observed 204045
    "bpe_merges" -> 272776L, // observed 103620
    "capex_pipeline" -> 3687816L, // observed 1811140
    "capex_pipeline_bucketed" -> 65536L, // observed 0
    "chunk_documents" -> 241962L, // observed 88213
    "click_attribution" -> 78862L, // observed 6663
    "composite_key" -> 899060L, // observed 416762
    "contamination_frac" -> 291120L, // observed 112792
    "corpus_clean" -> 819640L, // observed 377052
    "corpus_mixture" -> 67094L, // observed 779
    "corpus_pipeline" -> 1586674L, // observed 760569
    "corpus_pipeline_indexed" -> 1416776L, // observed 675620
    "corpus_report" -> 292632L, // observed 113548
    "corpus_temperature" -> 67118L, // observed 791
    "decontaminate" -> 458744L, // observed 196604
    "decontaminate_bloom" -> 508024L, // observed 221244
    "dedup_best_rep" -> 434454L, // observed 184459
    "dedup_cluster_sizes" -> 257284L, // observed 95874
    "dedup_components" -> 255556L, // observed 95010
    "dedup_containment" -> 535800L, // observed 235132
    "dedup_edit_distance" -> 246294L, // observed 90379
    "dedup_embedding" -> 65536L, // observed 0
    "dedup_exact" -> 109228L, // observed 21846
    "dedup_incremental" -> 246422L, // observed 90443
    "dedup_jaccard_prefix" -> 4158644L, // observed 2046554
    "dedup_minhash" -> 245096L, // observed 89780
    "dedup_minhash_verified" -> 421522L, // observed 177993
    "dedup_ngram_jaccard" -> 535800L, // observed 235132
    "dedup_rate_curve" -> 543658L, // observed 239061
    "dedup_rate_source" -> 270202L, // observed 102333
    "dedup_rewrite" -> 4042432L, // observed 1988448
    "dedup_semantic" -> 1244106L, // observed 589285
    "dedup_simhash" -> 248132L, // observed 91298
    "dedup_spans" -> 3655776L, // observed 1795120
    "distinct_user_digest" -> 130226L, // observed 32345
    "distinct_users_approx" -> 125460L, // observed 29962
    "distinct_users_skewsafe" -> 115604L, // observed 25034
    "embed_centroids" -> 88462L, // observed 11463
    "embed_covar" -> 133036L, // observed 33750 (r9 bound guard)
    "embed_pca" -> 362472L, // observed 148468 (r9 top-m deflation basis)
    "embed_dim_stats" -> 70324L, // observed 2394
    "embed_kmeans" -> 434094L, // observed 184279
    "embed_knn_classify" -> 76042L, // observed 5253
    "embed_logreg" -> 85268L, // observed 9866
    "embed_norm" -> 65536L, // observed 0
    "embed_outliers" -> 434310L, // observed 184387
    "embed_quantize" -> 331930L, // observed 133197
    "embed_reduce" -> 331930L, // observed 133197
    "event_transitions" -> 117034L, // observed 25749
    "events_anomaly" -> 137228L, // observed 35846
    "events_anomaly_mad" -> 227256L, // observed 80860
    "events_gap_fill" -> 104332L, // observed 19398
    "events_histogram" -> 129256L, // observed 31860
    "events_json" -> 117808L, // observed 26136
    "events_rolling" -> 106676L, // observed 20570
    "events_salted_join" -> 103562L, // observed 19013
    "events_throttle" -> 97880L, // observed 16172
    "events_top_paths" -> 109090L, // observed 21777
    "events_trend" -> 118060L, // observed 26262
    "events_twap" -> 106676L, // observed 20570
    "events_winsorize" -> 152594L, // observed 43529
    "exclusion_detail" -> 899060L, // observed 416762
    "exclusion_explain" -> 899060L, // observed 416762
    "exclusion_reasons" -> 899060L, // observed 416762
    "fail_open_reinstate" -> 2158248L, // observed 1046356
    "fk_integrity" -> 270661L, // observed 136750 (TIGHT x1.5 exhibit)
    "funnel_steps" -> 85112L, // observed 9788
    "hop_window_agg" -> 265344L, // observed 99904
    "importance_sample" -> 260854L, // observed 97659
    "importance_weights" -> 260854L, // observed 97659
    "index_occupancy" -> 1286278L, // observed 610371
    "ivf_recall_curve" -> 1009632L, // observed 472048
    "langid_confusion" -> 252804L, // observed 93634
    "length_buckets" -> 245402L, // observed 89933
    "map_zone_region" -> 899060L, // observed 416762
    "merge_upsert" -> 227718L, // observed 81091
    "metric_drift" -> 128230L, // observed 31347
    "mixture_epochs" -> 67118L, // observed 791
    "mixture_realized" -> 68692L, // observed 1578
    "mm_dedup" -> 297262L, // observed 115863
    "mm_frame_sample" -> 241962L, // observed 88213
    "mm_pipeline" -> 248242L, // observed 91353
    "mm_resize" -> 78206L, // observed 6335
    "normalize_category" -> 899060L, // observed 416762
    "pack_efficiency" -> 489498L, // observed 211981
    "pack_sequences" -> 261918L, // observed 98191
    "pack_sequences_bpe" -> 469542L, // observed 202003
    "part_communities" -> 536976L, // observed 235720
    "part_pagerank" -> 611650L, // observed 273057
    "part_triangles" -> 585576L, // observed 260020
    "pit_join" -> 81676L, // observed 8070
    "pivot_amounts" -> 972042L, // observed 453253
    "pq_distortion" -> 733468L, // observed 333966
    "pq_index_probe" -> 1084356L, // observed 509410 (r9 salted two-phase)
    "pq_opq_distortion" -> 744898L, // observed 339681
    "pq_permute" -> 76860L, // observed 5662
    "pq_radius" -> 732340L, // observed 333402
    "pq_recall_report" -> 1086512L, // observed 510488 (r9 salted two-phase)
    "price_quantiles" -> 142606L, // observed 38535
    "price_quantiles_approx" -> 227780L, // observed 81122
    "q1_agg" -> 327748L, // observed 131106
    "q1_rollup" -> 328672L, // observed 131568
    "q3_join" -> 230498L, // observed 82481
    "q5_multijoin" -> 257472L, // observed 95968
    "q6_filter" -> 65708L, // observed 86
    "quality_floor_lang" -> 272910L, // observed 103687
    "quality_lm_agreement" -> 653644L, // observed 294054
    "quality_logreg" -> 84646L, // observed 9555
    "quality_logreg_agreement" -> 459334L, // observed 196899
    "quality_tiers" -> 438040L, // observed 186252
    "range_join_bands" -> 66504L, // observed 484
    "recode_office_furniture" -> 899060L, // observed 416762
    "representative_rows" -> 937948L, // observed 436206
    "retention_cohorts" -> 88608L, // observed 11536
    "rule_dash_filter" -> 899060L, // observed 416762
    "rule_ds_counter_filter" -> 899060L, // observed 416762
    "rule_equipment_filter" -> 899060L, // observed 416762
    "rule_function_filter" -> 899060L, // observed 416762
    "rule_non_ops" -> 899060L, // observed 416762
    "rule_personal_device" -> 899060L, // observed 416762
    "rule_remark_filter" -> 899060L, // observed 416762
    "rule_status_filter" -> 899060L, // observed 416762
    "sample_cap_domain" -> 118570L, // observed 26517
    "sample_diverse" -> 448372L, // observed 191418
    "sample_exact_n" -> 81248L, // observed 7856
    "sample_stratified" -> 65536L, // observed 0
    "scd2_intervals" -> 100920L, // observed 17692
    "semi_filter" -> 1352202L, // observed 643333
    "session_overlap" -> 100920L, // observed 17692
    "shard_manifest" -> 1606544L, // observed 770504
    "skew_report" -> 92908L, // observed 13686
    "skew_report_sketch" -> 130908L, // observed 32686
    "snapshot_diff" -> 332030L, // observed 133247
    "source_overlap" -> 4242418L, // observed 2088441
    "source_top_ngrams" -> 1329112L, // observed 631788
    "specialized_items" -> 1123718L, // observed 529091
    "split_holdout" -> 433796L, // observed 184130
    "split_leakage" -> 1358884L, // observed 646674
    "split_pm_subcategory" -> 899060L, // observed 416762
    "stream_sessionize" -> 106676L, // observed 20570
    "stream_window_agg" -> 165122L, // observed 49793
    "summary_report" -> 4240748L, // observed 2087606
    "table_stats" -> 973574L, // observed 454019
    "table_stats_approx" -> 1063484L, // observed 498974
    "tag_category_type" -> 899060L, // observed 416762
    "text_bpe_encode" -> 449202L, // observed 191833
    "text_fingerprint" -> 241962L, // observed 88213
    "text_langid" -> 241962L, // observed 88213
    "text_lm_score" -> 272776L, // observed 103620
    "text_negation_flags" -> 899060L, // observed 416762
    "text_ngram_freq" -> 1065704L, // observed 500084
    "text_normalize" -> 241962L, // observed 88213
    "text_novelty" -> 2024238L, // observed 979351
    "text_quality" -> 241962L, // observed 88213
    "text_redact_pii" -> 241962L, // observed 88213
    "text_repetition" -> 1056384L, // observed 495424
    "text_tfidf" -> 329180L, // observed 131822
    "text_tokens" -> 241962L, // observed 88213
    "top_docs" -> 254660L, // observed 94562
    "topk_per_group" -> 80440L, // observed 7452
    "unpivot_lineitem" -> 65536L, // observed 0
    "user_rfm" -> 79308L, // observed 6886
    "validate_fields" -> 2869576L, // observed 1402020
    "validate_fn_reasons" -> 3952830L, // observed 1943647
    "validate_keys" -> 3350854L, // observed 1642659
    "validate_mismatches" -> 2476776L, // observed 1205620
    "validate_prf" -> 2476914L, // observed 1205689
    "validate_report" -> 5376830L, // observed 2655647
  )
}
