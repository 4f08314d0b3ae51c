package graft

/** Catalog-wide plan-budget regression net (r7, VERDICT item 2): EVERY
  * SparkEntry.queries entry runs end-to-end under PlanBudgetHarness and is
  * audited against a per-query budget of EXECUTED SHUFFLE-MAP STAGES —
  * construction-time jobs included, which is what makes this stronger than
  * a final-plan audit: iterative operators surface only their last round
  * in the returned frame's plan, so the r5 pagerank per-round edge
  * reshuffle (+2 stages x 8 rounds = +16 over the budgeted 13) is exactly
  * the class of regression only the executed count catches. Plus, for
  * every query: NO CartesianProduct ever, and BroadcastNestedLoopJoin only
  * at its pinned occurrence count (legitimate only for contract-bounded
  * broadcast sides: the ANN query sets, 1-row totals frames).
  *
  * Budgets are the r7 observed counts at spec scale plus bounded slack
  * (+2; +4 for convergence-dependent iterative families and the widest
  * multi-sheet reports, whose round/sheet counts may shift with a testdata
  * regen). A NEW catalog entry without a budget row FAILS the suite — new
  * operators inherit the plan gate automatically, the way EdgeCaseSpec
  * auto-covers them for empty/null/skew.
  *
  * To re-observe after an intentional plan change:
  *   sbt 'Test/runMain graft.tools.PlanBudgetProbe /root/testdata/sf0.001'
  */
class PlanBudgetSpec extends SparkSpecBase {

  /** maxStages = executed shuffle-map stage ceiling; bnlj = exact pinned
    * BroadcastNestedLoopJoin occurrence count in the final formatted plan
    * (structural, so pinned exactly, not bounded).
    */
  private case class B(maxStages: Int, bnlj: Int)

  private val budgets: Map[String, B] = Map(
    "ab_test_ztest" -> B(4, 0),
    "agg_incremental" -> B(7, 0),
    "ann_bruteforce" -> B(3, 4),
    // r10 lexical retrieval: tokenize scan + postings/df partial aggs +
    // broadcast query-term join + salted two-phase top-k (observed 9);
    // the 4 BNLJs are the 1-row corpus-stats broadcast (the
    // ann_bruteforce contract-bounded class)
    "lexical_topk" -> B(11, 4),
    // r10 persisted-index probe: ceiling covers the ensure-build path
    // (postings/df/stats writes; observed 7 cold); warm probes are the
    // broadcast query-term join + candidate scan + salted top-k
    "lexical_index_probe" -> B(9, 4),
    // r10 DoReMi reweighting: the D32 LM pass + one #sources-bounded agg
    // (observed 6); the 12 BNLJs are all 1-row broadcasts (corpus totals,
    // weight normalizer, LM bigram-count literal derivation)
    "mixture_doremi" -> B(8, 12),
    // r10 single-term impact radius: warm index, broadcast rare-query-term
    // join + per-row predicate + pair distinct (observed 4, zero BNLJ —
    // stats are baked literals)
    "lexical_radius" -> B(6, 0),
    // r10 persisted hybrid: two warm index probes + the contract-bounded
    // fusion window (observed 9; BNLJ count is lexical's 1-row stats
    // broadcast — the LSH list joins on bucket equality)
    "hybrid_rrf_indexed" -> B(11, 4),
    // r10 hybrid recall QC: ground truth + two probe lists + the
    // k-bounded scoreboard joins (observed 10); BNLJ = bruteforce's
    // query crossJoin + lexical's stats broadcast
    "hybrid_recall_report" -> B(12, 8),
    // r10 phrase retrieval: one posexplode scan + vocab df agg + the
    // broadcast phrase join + positional adjacency join (observed 5)
    "lexical_phrase" -> B(7, 0),
    // r11 k-token phrase forms: same posexplode + df shape, the k-gram
    // window and the chain joins all reuse broadcast/equality exchanges
    // (observed 4 at k=3)
    "lexical_phrase_k" -> B(6, 0),
    // r11 tokenizer round-trip gate: the merge-mine aggregate + the
    // map-only encode/decode pass (observed 3)
    "bpe_roundtrip" -> B(5, 0),
    // r12 hierarchical BPE: train is a bounded driver-side sample collect
    // (observed 0 distributed stages; 2 covers a spread scan), the
    // round-trip gate is the map-only heap encode/decode (observed 1)
    "bpe_train_hier" -> B(2, 0),
    "bpe_roundtrip_hier" -> B(3, 0),
    // r12 script-mix profile: one map-side regex-count scan (observed 1)
    "text_script_profile" -> B(3, 0),
    // r12 five-width span sweep: one explode + one (width, hash) partial
    // agg; countDistinct expands two-stage (observed 3)
    "dedup_spans_multi" -> B(5, 0),
    // r13 NN-descent graph build: 5 scored top-K passes (ring seed + 4
    // refinement rounds), each a 2-join + window chain (observed 25);
    // offline index-build operator, pay-at-build like the PQ codebooks
    "ann_knn_graph" -> B(28, 0),
    // r13 maximal repeated intervals: explode + (width,hash) partial agg +
    // repeated join + two doc-partitioned windows (observed 4)
    "dedup_spans_maximal" -> B(6, 0),
    // r12 real GIF frame round trip: map-only encode+decode (observed 1)
    "mm_frames_real" -> B(3, 0),
    // r12 incremental flagship: ceiling covers the COLD path (state table
    // + bench blocklist + signature index builds; observed 37) plus the
    // CC loop's convergence-dependent rounds (+4, the iterative-family
    // slack); the 4 BNLJs are the mixture/pack 1-row totals broadcasts
    "corpus_pipeline_incremental" -> B(41, 4),
    "lexical_phrase_slop" -> B(6, 0),
    // r11 persisted positional probes: warm probes are broadcast-only
    // (observed 0-2 stages); the ceiling covers the cold ensure-build
    // path (bucketed position write + df agg), the lexical_index_probe
    // convention
    "lexical_phrase_indexed" -> B(6, 0),
    "lexical_phrase_slop_indexed" -> B(6, 0),
    // r10 RRF fusion: lexical list + the exact-cosine list + the
    // contract-bounded (<= 2k rows/query) fusion window (observed 11);
    // BNLJs = lexical's stats broadcast + bruteforce's query crossJoin
    "hybrid_rrf" -> B(13, 8),
    "ann_index_multiprobe" -> B(4, 0),
    "ann_index_probe" -> B(3, 0),
    "ann_int8" -> B(4, 4),
    "ann_ivf" -> B(9, 0),
    "ann_lsh" -> B(3, 0),
    // r9 observed 8 (salted two-phase shortlist adds one bounded exchange)
    "ann_pq" -> B(10, 0),
    // r9: IVF ranking pass + PQ train/encode + pruned ADC serve (observed 14)
    "ann_ivfadc" -> B(16, 0),
    // r9: covariance-diag permutation barrier + the full D73 serve (observed 14)
    "ann_pq_opq" -> B(16, 0),
    // r10 triple: permutation barrier + IVF ranking + PQ train/encode +
    // pruned ADC serve, all over the permuted projection (observed 19)
    "ann_opq_ivfadc" -> B(21, 0),
    // the 4 BNLJs are the r9 exactness-bound guard's 1-row broadcast
    // (contract-bounded, the embed_logreg class)
    "embed_covar" -> B(6, 4),
    // T=8 power-iteration barrier jobs over the 64-row matrix + the
    // covariance pass; the 16 BNLJs are the 1-row vector broadcasts
    // (contract-bounded, the embed_logreg class)
    // r9 top-m basis: m=4 components x T=8 power-iteration barriers + 3
    // deflations over the 64-row matrix (observed 42); the 32 BNLJs are
    // the per-component 1-row vector broadcasts (contract-bounded)
    "embed_pca" -> B(44, 32),
    // r9 OPQ-lite: covariance diag + 64-row rank/deal (the 4 BNLJs are the
    // bound guard's, as in embed_covar)
    "pq_permute" -> B(7, 4),
    // permuted-projection barrier + the D74 gauge (observed 10)
    "pq_opq_distortion" -> B(12, 0),
    // the 4 BNLJs are the exact-L2 side's contract-bounded query-set
    // broadcast (the ann_bruteforce class)
    "pq_recall_report" -> B(11, 4),
    // r9 scoreboard: three serving pipelines + the shared ground truth in
    // one query (observed 38; the exact side's BNLJ sits behind the
    // checkpoint barrier, so the final plan pins 0)
    "ann_recall_matrix" -> B(42, 0),
    // probe ceiling covers the ensure-build path (codebook + centroids +
    // cell-annotated encode jobs run inside the first call in a fresh JVM;
    // r10 observed 11 with the home-cell build stages); a warm-index probe
    // executes ~3
    "pq_index_probe" -> B(13, 0),
    // r9 radius form: warm-pair LUT + ADC scan + the radius filter
    // (r10 observed 0 — broadcast LUT over the bucketed codes scan, no
    // exchange at all: the streamable shape)
    "pq_radius" -> B(10, 0),
    // r10 cell-pruned radius: warm pair, broadcast probe list + LUT over
    // the codes scan (observed 1); the 4 BNLJs are the query-set x
    // stored-centroid ranking crossJoin — contract-bounded (10 queries x
    // <= NumCells rows, the ann_bruteforce class)
    "pq_radius_ivf" -> B(3, 4),
    // r10 persisted IVFADC: warm pair, cell-gated ADC + salted top-R +
    // refine (observed 4); same contract-bounded probe-ranking BNLJs
    "pq_ivfadc_probe" -> B(6, 4),
    // r10 OPQ pair probe: ceiling covers the ensure-build path (perm +
    // permuted codebook/centroids/codes writes; observed 20); warm probes
    // execute the pq_index_probe tail + the query re-layout
    "pq_opq_index_probe" -> B(22, 0),
    // r10 persisted OPQ+IVF+ADC triple: ensure-build of the OPQ pair +
    // query re-layout + cell-gated ADC + salted top-R + refine (observed
    // 21); same contract-bounded probe-ranking BNLJs as pq_ivfadc_probe
    "pq_opq_ivfadc_probe" -> B(23, 4),
    // r10 text classifier: tier pass + bucket-count featurize + 3 GD
    // iterations + the map-only scoring tail (observed 13); the 4 BNLJs
    // are the 1-row weight-frame broadcasts (the embed_logreg class)
    "quality_logreg_text" -> B(15, 4),
    // r10: the D87 scorer + D28 tiers + the bounded cells/totals tail
    // (observed 19; the weight-frame BNLJs sit behind the cells barrier)
    "quality_logreg_text_agreement" -> B(21, 0),
    "pq_distortion" -> B(7, 0),
    // 3 GD iterations x (gradient + weight-rebuild) + the holdout
    // confusion tail; the final-plan BNLJs are the 1-row confusion/total
    // broadcasts (contract-bounded) — the training steps' BNLJs sit
    // behind checkpoint barriers and show in stages, not the final plan
    "embed_logreg" -> B(10, 4),
    "ann_lsh_multiprobe" -> B(4, 0),
    "ann_recall_curve" -> B(9, 4),
    "ann_recall_report" -> B(4, 4),
    "append_region_comment" -> B(6, 0),
    "asof_join" -> B(4, 0),
    "basket_pairs" -> B(6, 4),
    "bpe_coverage" -> B(6, 0),
    "bpe_merges" -> B(4, 0),
    "capex_pipeline" -> B(14, 0),
    "capex_pipeline_bucketed" -> B(2, 0),
    "chunk_documents" -> B(3, 0),
    "click_attribution" -> B(4, 0),
    "composite_key" -> B(6, 0),
    "contamination_frac" -> B(5, 0),
    "corpus_clean" -> B(21, 0),
    "corpus_mixture" -> B(5, 4),
    // flagship composition: corpus_clean's stages + mixture aggregate +
    // BPE pack window; iterative slack for the CC rounds (r8 observed 28;
    // the 4 BNLJs are the mixture's 1-row broadcast total, as in
    // corpus_mixture). The indexed twin swaps signature recompute for the
    // stored band table — same stage count at spec scale (the saving is
    // CPU + the index-side exchange, which is not a separate map stage
    // here because the recompute's exchange serves the same join).
    "corpus_pipeline" -> B(32, 4),
    "corpus_pipeline_indexed" -> B(32, 4),
    "corpus_report" -> B(4, 0),
    "corpus_temperature" -> B(4, 4),
    "decontaminate" -> B(6, 0),
    "decontaminate_bloom" -> B(7, 0),
    "dedup_best_rep" -> B(15, 0),
    // r8: D19's CC labels + two bounded partial-agg rollups
    "dedup_cluster_sizes" -> B(15, 0),
    "dedup_components" -> B(13, 0),
    "dedup_containment" -> B(4, 0),
    "dedup_edit_distance" -> B(4, 0),
    "dedup_embedding" -> B(3, 0),
    "dedup_exact" -> B(3, 0),
    "dedup_incremental" -> B(6, 0),
    "dedup_jaccard_prefix" -> B(6, 0),
    "dedup_minhash" -> B(4, 0),
    // r8: banded candidates + |candidates|-bounded exact-Jaccard confirm
    "dedup_minhash_verified" -> B(5, 0),
    "dedup_ngram_jaccard" -> B(4, 0),
    "dedup_rate_curve" -> B(8, 4),
    "dedup_rate_source" -> B(16, 0),
    "dedup_rewrite" -> B(7, 0),
    "dedup_semantic" -> B(12, 0),
    "dedup_simhash" -> B(4, 0),
    "dedup_spans" -> B(5, 0),
    "distinct_user_digest" -> B(5, 0),
    "distinct_users_approx" -> B(6, 0),
    "distinct_users_skewsafe" -> B(5, 0),
    "embed_centroids" -> B(3, 0),
    "embed_dim_stats" -> B(3, 0),
    "embed_kmeans" -> B(9, 0),
    "embed_knn_classify" -> B(3, 4),
    "embed_norm" -> B(2, 0),
    "embed_outliers" -> B(9, 0),
    "embed_quantize" -> B(3, 0),
    "embed_reduce" -> B(3, 0),
    "event_transitions" -> B(5, 0),
    "events_anomaly" -> B(5, 0),
    "events_anomaly_mad" -> B(8, 0),
    "events_gap_fill" -> B(4, 0),
    "events_histogram" -> B(5, 0),
    "events_json" -> B(4, 0),
    "events_rolling" -> B(3, 0),
    "events_salted_join" -> B(4, 0),
    "events_throttle" -> B(3, 0),
    "events_top_paths" -> B(4, 0),
    "events_trend" -> B(4, 0),
    "events_twap" -> B(3, 0),
    "events_winsorize" -> B(5, 0),
    "exclusion_detail" -> B(6, 0),
    "exclusion_explain" -> B(6, 0),
    "exclusion_reasons" -> B(6, 0),
    "fail_open_reinstate" -> B(14, 0),
    // 9 core stages + 5 local-only spreadIfNarrow shuffles (no-ops on
    // pre-split cluster scans) for the per-child stack+partial-agg passes
    "fk_integrity" -> B(16, 0),
    "funnel_steps" -> B(7, 0),
    "hop_window_agg" -> B(4, 0),
    "importance_sample" -> B(4, 0),
    // r8: one linear keyed partial-agg per structure (minhash bands,
    // emb-LSH bands, simhash combos, ann_lsh buckets, ivf cells) + the
    // block-bounded rollups; BNLJs are the IVF centroid broadcasts (the
    // ann family's contract-bounded side)
    "index_occupancy" -> B(18, 8),
    "importance_weights" -> B(4, 0),
    // r8: all-depth IVF curve from ONE assignment pass; BNLJs are the
    // broadcast query set (the ann family's contract-bounded side)
    "ivf_recall_curve" -> B(12, 4),
    "langid_confusion" -> B(5, 0),
    "length_buckets" -> B(4, 0),
    "map_zone_region" -> B(6, 0),
    "merge_upsert" -> B(7, 0),
    "metric_drift" -> B(5, 0),
    "mixture_epochs" -> B(4, 4),
    // r8: inherits corpus_mixture's rate-table broadcasts + its own 1-row
    // totals broadcast — all contract-bounded 1-row/`#langs`-row sides
    "mixture_realized" -> B(8, 10),
    "mm_dedup" -> B(4, 0),
    // r11 real codec round trip: map-only PNG encode+decode mapPartitions
    // over the documents scan (observed 1 — the write stage)
    "mm_decode_real" -> B(3, 0),
    "mm_resize_real" -> B(3, 0),
    "mm_frame_sample" -> B(3, 0),
    "mm_pipeline" -> B(3, 0),
    "mm_resize" -> B(3, 0),
    "normalize_category" -> B(6, 0),
    // r8: both packers' windows + the shards-bounded stats aggregate
    "pack_efficiency" -> B(7, 0),
    "pack_sequences" -> B(4, 0),
    "pack_sequences_bpe" -> B(6, 0),
    "part_communities" -> B(22, 0),
    // TIGHT by design: observed 9 (+4 convergence slack). The r5 bug —
    // a per-round edge reshuffle — costs +2 stages x up-to-8 rounds and
    // blows through 13 immediately; this row is the regression canary.
    "part_pagerank" -> B(13, 0),
    "part_triangles" -> B(10, 0),
    "pit_join" -> B(4, 0),
    "pivot_amounts" -> B(7, 0),
    "price_quantiles" -> B(3, 0),
    "price_quantiles_approx" -> B(4, 0),
    "q1_agg" -> B(4, 0),
    "q1_rollup" -> B(4, 0),
    "q3_join" -> B(3, 0),
    "q5_multijoin" -> B(4, 0),
    "q6_filter" -> B(3, 0),
    "quality_floor_lang" -> B(5, 0),
    "quality_lm_agreement" -> B(11, 0),
    // r9 classifier-as-filter: 3 GD iterations + the baked scoring scan
    // (observed 6); the 4 BNLJs are the 1-row weight broadcast
    "quality_logreg" -> B(8, 4),
    // trainer + tier machinery + the bounded cells/totals tail (observed 12)
    "quality_logreg_agreement" -> B(14, 0),
    "quality_tiers" -> B(6, 0),
    "range_join_bands" -> B(3, 4),
    "recode_office_furniture" -> B(6, 0),
    "representative_rows" -> B(7, 0),
    "retention_cohorts" -> B(4, 0),
    "rule_dash_filter" -> B(6, 0),
    "rule_ds_counter_filter" -> B(6, 0),
    "rule_equipment_filter" -> B(6, 0),
    "rule_function_filter" -> B(6, 0),
    "rule_non_ops" -> B(6, 0),
    "rule_personal_device" -> B(6, 0),
    "rule_remark_filter" -> B(6, 0),
    "rule_status_filter" -> B(6, 0),
    "sample_cap_domain" -> B(4, 0),
    "sample_diverse" -> B(9, 0),
    "sample_exact_n" -> B(3, 0),
    "sample_stratified" -> B(2, 0),
    "scd2_intervals" -> B(3, 0),
    "semi_filter" -> B(8, 0),
    // r8: composes the flagship manifest (corpus_pipeline's stage set) +
    // one shard-bounded aggregate; same iterative CC slack as the flagship
    "shard_manifest" -> B(34, 4),
    "session_overlap" -> B(3, 0),
    "skew_report" -> B(5, 0),
    "skew_report_sketch" -> B(6, 0),
    "snapshot_diff" -> B(8, 0),
    "source_overlap" -> B(7, 0),
    "source_top_ngrams" -> B(5, 0),
    "specialized_items" -> B(7, 0),
    "split_holdout" -> B(15, 0),
    // r8: split assignment (CC loop) + all four near-dup family link sets
    // joined to the split frame; same iterative CC slack as split_holdout
    "split_leakage" -> B(28, 0),
    "split_pm_subcategory" -> B(8, 0),
    "stream_sessionize" -> B(3, 0),
    "stream_window_agg" -> B(4, 0),
    "summary_report" -> B(21, 0),
    "table_stats" -> B(6, 0),
    "table_stats_approx" -> B(7, 0),
    "tag_category_type" -> B(6, 0),
    "text_bpe_encode" -> B(5, 0),
    "text_fingerprint" -> B(3, 0),
    "text_langid" -> B(3, 0),
    "text_lm_score" -> B(4, 0),
    "text_negation_flags" -> B(6, 0),
    "text_ngram_freq" -> B(4, 0),
    "text_normalize" -> B(3, 0),
    "text_novelty" -> B(7, 0),
    "text_quality" -> B(3, 0),
    "text_redact_pii" -> B(3, 0),
    "text_repetition" -> B(5, 0),
    "text_tfidf" -> B(7, 4),
    "text_tokens" -> B(3, 0),
    "top_docs" -> B(3, 0),
    "topk_per_group" -> B(3, 0),
    "unpivot_lineitem" -> B(2, 0),
    "user_rfm" -> B(9, 0),
    "validate_fields" -> B(17, 0),
    "validate_fn_reasons" -> B(18, 0),
    "validate_keys" -> B(19, 4),
    "validate_mismatches" -> B(16, 0),
    "validate_prf" -> B(17, 0),
    "validate_report" -> B(33, 28),
  )

  // Shuffle WRITE byte ceilings (r8, VERDICT item 3): the volume axis the
  // stage count can't see — fk_integrity's r7 single-scan rewrite shipped
  // 3.1× less shuffle at an EQUAL stage count, so a regression back to the
  // wide form (the r5-pagerank class, in bytes) needs its own net.
  // Ceilings are the r8 probe observations at spec scale × 2 (+64 KiB
  // floor for near-zero queries, absorbing testdata-regen jitter);
  // deliberately tight exhibits are marked. Regenerate observations with
  // tools.PlanBudgetProbe (prints shuffleWriteBytes per query).
  private val byteBudgets: Map[String, Long] = ByteBudgets.table

  test("every catalog query has a budget row (new operators inherit the gate)") {
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty,
      s"add plan budgets for: ${missing.toSeq.sorted.mkString(", ")} " +
        "(observe with tools.PlanBudgetProbe)")
  }

  test("all queries stay inside their executed shuffle-stage budgets; no cartesians") {
    PlanBudgetHarness.warmPersistedIndexes(spark, sfDir)
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val m = try PlanBudgetHarness.measure(spark, fn, sfDir)
      catch { case e: Throwable =>
        violations += s"$name: threw $e"; PlanBudgetHarness.Measured(-1, "", 0L)
      }
      if (m.stages >= 0) {
        val b = budgets.getOrElse(name, B(0, 0))
        if (m.stages > b.maxStages)
          violations += s"$name: ${m.stages} shuffle stages > budget ${b.maxStages}"
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(m.plan).length
        if (bnlj != b.bnlj)
          violations += s"$name: $bnlj BNLJ occurrences != pinned ${b.bnlj}"
        if (m.plan.contains("CartesianProduct"))
          violations += s"$name: CartesianProduct in final plan"
        byteBudgets.get(name).foreach { cap =>
          if (m.shuffleWriteBytes > cap)
            violations += s"$name: ${m.shuffleWriteBytes} shuffle write bytes > budget $cap"
        }
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("every catalog query has a shuffle-byte budget row") {
    val missing = SparkEntry.queries.keySet -- byteBudgets.keySet
    assert(missing.isEmpty,
      s"add byte budgets for: ${missing.toSeq.sorted.mkString(", ")} " +
        "(observe with tools.PlanBudgetProbe)")
  }
}
