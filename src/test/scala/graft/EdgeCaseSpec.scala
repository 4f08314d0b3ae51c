package graft

/** Degenerate-input robustness: a pipeline that 19 rules, window ranks,
  * iterative label propagation, and integer rate arithmetic all run over
  * must not explode when a partition/day/language slice is EMPTY — at
  * 100 TB empty slices are routine (a new source with no docs yet, a
  * filter that matches nothing). Every listed query must evaluate on an
  * all-empty dataset without throwing; row counts are whatever the
  * operator's semantics say (0 for per-row ops, 1 for global aggregates).
  */
class EdgeCaseSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // limit(0) of the RAW reads keeps physical schemas identical (events.ts
    // stays nanos-long so Tables.events' normalization applies unchanged)
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  private val battery = Seq(
    // D-family: dedup, sampling, text, embeddings
    "dedup_exact", "dedup_minhash", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_components", "dedup_incremental", "dedup_spans", "decontaminate",
    "dedup_best_rep",
    "dedup_embedding", "ann_bruteforce", "ann_lsh", "ann_ivf", "embed_kmeans",
    "embed_centroids", "text_langid", "text_quality", "text_tokens",
    "text_fingerprint", "text_tfidf", "text_repetition", "text_redact_pii",
    "pack_sequences", "sample_stratified", "sample_cap_domain",
    "corpus_mixture", "corpus_clean", "corpus_report", "quality_tiers",
    "top_docs", "mm_pipeline",
    "decontaminate_bloom",
    // E-family: analytics, events, temporal
    "q1_agg", "q1_rollup", "q6_filter", "topk_per_group", "events_json",
    "stream_window_agg", "stream_sessionize", "asof_join",
    "range_join_bands", "distinct_users_skewsafe", "price_quantiles",
    "events_rolling", "scd2_intervals", "hop_window_agg", "agg_incremental",
    "events_salted_join", "skew_report", "embed_reduce", "session_overlap",
    // the full rule pipeline and the validation aggregate
    "capex_pipeline", "validate_prf")

  test("every operator evaluates on an all-empty dataset without throwing") {
    battery.foreach { name =>
      val n = try SparkEntry.queries(name)(spark, emptyDir).count()
      catch {
        case e: Throwable =>
          graft.capex.CapexDerive.clearCache()
          Checkpoints.releaseAll()
          fail(s"$name threw on empty input: $e")
      }
      assert(n >= 0)
      graft.capex.CapexDerive.clearCache()
      Checkpoints.releaseAll()
    }
  }
}
