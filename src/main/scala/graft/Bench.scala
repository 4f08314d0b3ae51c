package graft


/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver. Results are written to the `noop`
  * sink so every column and operator is actually evaluated (a count() would
  * let Catalyst prune the interesting work away).
  */
object Bench {

  /** Headliners: one per engine area — scan/agg, joins, window, the full
    * capex rule pipeline, near-dup + ANN, text ops, events + sessionization,
    * plus (r4) the five most expensive round-3 plans so a plan regression
    * there shows up in the tracked wall-times.
    */
  val Headliners: Seq[String] = Seq(
    "q1_agg", "q3_join", "q5_multijoin", "topk_per_group",
    "capex_pipeline", "dedup_minhash", "dedup_ngram_jaccard",
    "ann_bruteforce", "text_quality", "events_json", "stream_sessionize",
    "dedup_spans", "corpus_clean", "session_overlap",
    "decontaminate_bloom", "embed_kmeans",
    "dedup_semantic", "text_lm_score", "split_holdout",
    "funnel_steps", "text_ngram_freq", "contamination_frac",
    // r4 additions: both iterative-propagation plans, the DSIR scorer,
    // and the two heaviest text passes (inverted-index novelty, span
    // rewrite with per-doc reassembly)
    "part_pagerank", "part_triangles", "importance_weights",
    "text_novelty", "dedup_rewrite",
    // late-r4 additions with real scan/shuffle cost (the other newcomers
    // are bounded-aggregate maps not worth a tracked slot)
    "source_top_ngrams", "user_rfm",
    // r5: the flagship over the RequestNo-bucketed fact — §5's production
    // layout; the one-time bucketed write happens in the untimed warmup
    // (a real deployment pays it at ingest), so the tracked number is the
    // zero-exchange pipeline tail
    "capex_pipeline_bucketed",
    // r6 additions: the persisted-ANN serving probe (index built in the
    // untimed warmup, same pay-at-ingest convention as the bucketed
    // flagship), the tokenizer-true BPE encode (the heaviest per-row text
    // pass), and the two profiling gates with real scan/shuffle cost
    // (table_stats' Expand distincts, fk_integrity's 7 keyed joins)
    "ann_index_probe", "text_bpe_encode", "table_stats", "fk_integrity",
    // the third iterative-propagation plan (shared early-exit CC loop) and
    // the session-journey ranking (window + path fold + TakeOrdered)
    "part_communities", "events_top_paths",
    // r7 additions with real scan/shuffle cost: the threshold-sweep dedup
    // curve (one D4 candidate pass serving 7 thresholds) and the IVF
    // core-set selection (assignment pass + twin rank windows); the other
    // r7 newcomers are bounded-aggregate maps (bpe_coverage rides the
    // same fold as the tracked text_bpe_encode; table_stats_approx's gate
    // form embeds the tracked table_stats)
    "dedup_rate_curve", "sample_diverse",
    // r8 additions: the D-family FLAGSHIP (the full clean → mixture →
    // BPE-pack manifest a pretraining run executes) and its persisted-
    // index twin (near-dup pairs served from the stored band table —
    // index built in the untimed warmup, the pay-at-ingest convention of
    // capex_pipeline_bucketed / ann_index_probe)
    "corpus_pipeline", "corpus_pipeline_indexed",
    // r8: the PQ two-stage serving query (codebook train + encode + ADC
    // scan + exact re-rank, all in one tracked plan — the compressed
    // complement of ann_index_probe's float-bucket serving) and its
    // persisted-pair probe (codebook + codes stored at ingest, so the
    // tracked number is LUT + ADC scan + R-row refine — the recurring
    // cost of a deployed PQ tier; pair built in the untimed warmup)
    "ann_pq", "pq_index_probe",
    // r9: the cell-pruned IVFADC composition (the published 10^9-scale
    // serving shape — the tracked number shows what pruning buys over the
    // full ADC scan of ann_pq) and the stateless radius form the streaming
    // probe is built on (persisted pair via the untimed-warmup convention)
    "ann_ivfadc", "pq_radius",
    // r10: the cell-pruned radius twin (what the home-cell gate buys over
    // pq_radius's full codes scan — the probe shape the streaming tier
    // serves), the stored-rotation probe (pay-at-ingest OPQ: the tracked
    // number is query re-layout + LUT + ADC + refine, no covariance or
    // encode pass), and the text-feature classifier (tier pass + bucket
    // featurize + 3 distributed GD iterations + map-only scoring — the
    // heaviest new text pass)
    "pq_radius_ivf", "pq_opq_index_probe", "quality_logreg_text",
    // late r10: the persisted IVFADC probe — the serving matrix's last
    // cell (cell-gated ADC + salted top-R + refine from the stored pair;
    // pair built in the untimed warmup, pay-at-ingest) — and the
    // OPQ+IVF+ADC triple (the complete published composition in one
    // tracked plan: rotation derive + re-layout + coarse prune + ADC)
    "pq_ivfadc_probe", "ann_opq_ivfadc",
    // r10 late: the PERSISTED triple — what D89's composition costs when
    // rotation/centroids/codebook/codes are all pinned at ingest (query
    // re-layout + coarse prune + cell-gated ADC + refine, warm pair)
    "pq_opq_ivfadc_probe",
    // r10 late: the lexical retrieval family — keyword top-k (tokenize +
    // postings aggs + broadcast query-term join + salted top-k) and the
    // RRF fusion with the exact-cosine list
    "lexical_topk", "hybrid_rrf",
    // r10 late: the impact radius (warm index, per-row cut) and the
    // DoReMi hedge update (one LM scan + #sources-bounded agg)
    "lexical_radius", "mixture_doremi",
    // r10 late: hybrid fusion from the two persisted indexes (the
    // production hybrid-search recurring cost), the fusion recall QC
    // sheet, and positional phrase retrieval
    "hybrid_rrf_indexed", "hybrid_recall_report", "lexical_phrase",
    // r11: the real codec round trip (PNG encode + ImageIO decode per
    // row — the heaviest new map-only pass), the full k-token phrase
    // over live positional postings, and its pay-at-ingest twin over the
    // persisted positional index (index built in the untimed warmup)
    "mm_decode_real", "lexical_phrase_k", "lexical_phrase_indexed",
    // r12 additions with real scan/decode/shuffle cost: the hierarchical
    // 5000-merge tokenizer round trip (driver-side train paid once +
    // map-only heap encode/decode — the heaviest per-row text pass), the
    // five-width span sweep (one explode, 5x window volume), the real
    // animated-GIF frame round trip, and the incremental flagship (state
    // + signature index built in the untimed warmup, pay-at-ingest — the
    // tracked number is the batch-sized recurring cost vs
    // corpus_pipeline's full recompute)
    "bpe_roundtrip_hier", "dedup_spans_multi", "mm_frames_real",
    "corpus_pipeline_incremental",
    // r13 additions: maximal repeated-span interval assembly (the span
    // family's heaviest composition) and the NN-descent K-NN graph build
    // (pay-at-build serving structure — 5 scored top-K passes)
    "dedup_spans_maximal", "ann_knn_graph")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core: the round driver's machine is local[32] and it
    // may not set SPARK_GRAFT_CPUS — an 8-thread default would 4× the bench
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    // GraftSession carries the measured-systemics config (codegen cache
    // sized above the catalog working set, sort shuffle for small wide
    // shuffles, AQE on) — see that object's scaladoc for the rationale.
    val spark = GraftSession.create(cpus)
    // Untimed warmup passes: drive every query's codegen + JIT (AQE picks
    // the same plans it will pick in the measured run, so the exact
    // generated classes are compiled) — standard JVM steady-state
    // benchmarking. TWO passes, because a single one leaves the tiered
    // JIT's C2 queue full of every query's classes and the first measured
    // pass then runs partially interpreted (measured: capex 30.6 s on the
    // first post-warmup pass vs 7.7 s two passes later, same binary).
    // Nothing carries over: the capex cache is cleared and every query
    // recomputes from the parquet scans.
    for (_ <- 1 to 2) {
      Headliners.foreach { name =>
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] warmup $name: $e") }
        graft.capex.CapexDerive.clearCache()
        graft.Checkpoints.releaseAll()
      }
    }
    // B14b's pay-at-ingest half, timed on its own: drop the bucketed fact
    // the warmup created and rebuild it JIT-warm, so BENCH carries BOTH
    // sides of the trade (the 0.4 s tail is real, but only after this
    // one-time CTAS — reported as its own row, excluded from `total` so
    // round-over-round totals stay comparable). Best-of-3 like every other
    // row (r9 — the r8 verdict's unreadable 26.8 s single-shot outlier):
    // drop + rebuild three times, report the min, so one neighbor-noise
    // spike can no longer masquerade as a plan regression.
    val ctasSec = {
      val tbl = graft.capex.CapexDerive.ensureBucketedEnriched(spark, sfDir)
      val ts = (1 to 3).map { _ =>
        spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
        graft.capex.CapexDerive.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { graft.capex.CapexDerive.ensureBucketedEnriched(spark, sfDir); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] ctas failed: $e"); false }
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      }
      if (ts.min == Double.MaxValue) -1.0 else ts.min
    }
    graft.capex.CapexDerive.clearCache()
    // quiesce: let the async ContextCleaner drain and collect warmup garbage
    // so the first measured query doesn't pay the warmup's GC debt
    System.gc()
    Thread.sleep(3000)
    System.gc()
    // Three measured passes, best-of-3 per query: this host is a shared VM
    // and transient neighbor noise can triple a query's wall time; the min
    // across passes reflects the engine, not the neighbor.
    def pass(): Seq[(String, Double)] = Headliners.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // a failed attempt must NOT enter the best-of-3 min (its near-zero
      // elapsed time would publish an impossible best and read as a
      // speedup) — same guard the wobbler extra passes carry
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e"); false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      // don't tax later queries' memory: drop capex caches AND every
      // ephemeral dedup/ann checkpoint from the finished query
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
      name -> dt
    }
    // Noise self-calibration (r7): one pinned CPU-bound probe per measured
    // pass — a fixed-iteration xorshift64* fold, single thread, zero
    // allocation, zero I/O — so a neighbor-noise-inflated run is
    // detectable from the BENCH json alone: on a quiet host the probe's
    // pass-to-pass spread is a few percent; CPU contention inflates it the
    // same way it inflates the query rows. Reported as `calib` (min — the
    // machine's quiet-point) and `calib_worst` (max); a calib_worst/calib
    // ratio well above ~1.2 marks the run's inflated rows as host noise,
    // not plan regressions. Excluded from `total` like the CTAS row.
    def calibProbe(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L; var acc = 0L; var i = 0
      while (i < 300000000) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        acc += x * 0x2545F4914F6CDD1DL; i += 1
      }
      if (acc == 42L) System.err.println("") // keep the fold observable
      (System.nanoTime() - t0) / 1e9
    }
    val passResults = scala.collection.mutable.ArrayBuffer[Seq[(String, Double)]]()
    val calibs = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 3) { calibs += calibProbe(); passResults += pass() }
    // Automatic noisy-window re-run (r9 — the r8 verdict's bench item): if
    // the calibration probe's own spread marks the window as contended
    // (calib_worst/calib > 1.3), the measured rows are suspect in the same
    // proportion — run ONE extra calibrated pass so each query's min gets a
    // shot at a quieter slice of the window. Bounded at one retry: a host
    // that stays noisy should REPORT noisy (the calib ratio survives in the
    // json precisely so the reader can discount the rows), not loop forever.
    if (calibs.max / calibs.min > 1.3) {
      System.err.println(f"[bench] calib ratio ${calibs.max / calibs.min}%.2f" +
        " > 1.3 — noisy window, running one extra measured pass")
      calibs += calibProbe(); passResults += pass()
    }
    val passes = passResults.toSeq
    // The two historical wobblers (q1_agg false-alarmed in r3/r5/r6,
    // part_triangles in r6 — both plan-unchanged): two extra best-of-5
    // passes tighten their min without re-running the whole catalog.
    val wobblers = Seq("q1_agg", "part_triangles").filter(Headliners.contains)
    val extraMin: Map[String, Double] = wobblers.map { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // a failed attempt must NOT enter the min (its near-zero elapsed
        // time would publish an impossible best and read as a speedup)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e"); false }
        graft.capex.CapexDerive.clearCache()
        graft.Checkpoints.releaseAll()
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.MaxValue
      }
      name -> ts.min
    }.toMap
    val results = Headliners.zipWithIndex.map { case (n, i) =>
      val best = math.min(passes.map(_(i)._2).min,
        extraMin.getOrElse(n, Double.MaxValue))
      // a query that failed EVERY attempt must publish the same -1.0
      // failure sentinel the stream/CTAS rows use, not Double.MaxValue
      // (which would render a 310-digit json value and corrupt `total`)
      n -> (if (best == Double.MaxValue) -1.0 else best)
    }
    // ---- streaming section (r12: isolated + self-calibrated) ----
    // The r11 verdict's bench item: the driver window inflated one stream
    // row 2.15× under a 1.07 batch calib — the single-thread CPU probe is
    // blind to the I/O + RocksDB + micro-batch-planner contention the
    // stream rows feel. Three changes: (1) quiesce before the section so
    // batch-pass GC debt can't bleed in, (2) every stream e2e row is now
    // BEST-OF-3 timed runs (the same discipline the batch rows have had
    // since r9 — a single-shot number on a shared VM measures the
    // neighbor), (3) the section carries its own calib bracket
    // (calib_stream / calib_stream_worst, probes taken at section entry
    // and exit) so a contended stream window is detectable from the json.
    System.gc()
    Thread.sleep(2000)
    val calibStreamStart = calibProbe()
    def scratch(prefix: String): java.nio.file.Path =
      graft.streaming.TempDirs.scratch(prefix)
    def bestOf3(body: () => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
      }.min
    // The REAL stateful sessionizer — parquet stream source →
    // flatMapGroupsWithState under the RocksDB state store → noop
    // streaming sink, AvailableNow — over the same sf's events. The batch
    // mirror (stream_sessionize) times the window-function twin; this row
    // is the only wall-clock record of the streaming engine itself (state
    // store, micro-batch planning, watermark bookkeeping). Staged dir +
    // one warmup run untimed; excluded from `total` like the CTAS row.
    val streamSec = try {
      val sdir = scratch("graft-bench-stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        sdir.resolve("part-00000.parquet"))
      import org.apache.spark.sql.functions.col
      import spark.implicits._
      def run(): Unit = {
        val cp = scratch("graft-bench-stream-cp")
        val ev = graft.streaming.StreamOps.readEventStream(spark, sdir.toString)
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.StreamOps.Event]
        val q = graft.streaming.StreamOps.sessionize(ev).writeStream
          .format("noop").option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        graft.streaming.TempDirs.release(cp)
      }
      run() // warmup: codegen + RocksDB open
      bestOf3(() => run())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream row failed: $e"); -1.0
    }
    // r8 streaming e2e rows (VERDICT item 6): the daily-ingest dedup probe
    // (documents stream → stream-static band join against the PERSISTED
    // signature index → watermarked pair-dedup state) and the
    // stream-stream interval click attribution — each reporting wall time
    // AND the ending state-store row count, the lifecycle metric a
    // streaming deployment capacity-plans on (wall time says how fast the
    // day drained; state rows say what RocksDB must hold to do it).
    // Same conventions as stream_sessionize_e2e: staged input, untimed
    // warmup (and, for the probe, the pay-at-ingest index build),
    // AvailableNow, excluded from `total`.
    def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Double = {
      val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
      if (ps.isEmpty) 0.0
      else ps.last.stateOperators.map(_.numRowsTotal.toDouble).sum
    }
    val (probeSec, probeStateRows) = try {
      val tbl = "bench_sig_index"
      // DROP alone is not enough across JVMs: the in-memory catalog forgets
      // the table but its warehouse directory persists, and a leftover dir
      // fails the CTAS — ensureTable clears the orphan first (and, after
      // the DROP, always rebuilds fresh)
      spark.sql(s"DROP TABLE IF EXISTS `$tbl`")
      graft.sources.BucketedSink.ensureTable(spark, tbl) {
        graft.sources.IndexSink.writeSignatureIndex(spark, sfDir, tbl, buckets = 32)
      }
      graft.Checkpoints.releaseAll()
      val sdir = scratch("graft-bench-probe")
      import org.apache.spark.sql.functions.{col, lit, to_timestamp}
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") % graft.llm.Dedup.IncrementalBatchMod === 0)
        .withColumn("arrived", to_timestamp(lit("2026-01-01 00:00:00")))
        .coalesce(4).write.mode("overwrite").parquet(sdir.toString)
      val schema = spark.read.parquet(sdir.toString).schema
      var stateRows = 0.0
      def run(): Unit = {
        val cp = scratch("graft-bench-probe-cp")
        val stream = spark.readStream.schema(schema).parquet(sdir.toString)
        val q = graft.streaming.StreamOps.indexProbeStream(spark, tbl, stream, "arrived")
          .writeStream.format("noop").option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] index probe stream row failed: $e"); (-1.0, -1.0)
    }
    // r9 streaming e2e row: the compressed-tier serving probe — query
    // vectors stream against the PERSISTED PQ pair (pair built in the
    // untimed warmup, the pay-at-ingest convention), scored through the
    // baked ADC expression in a stream-static join, radius cut, watermarked
    // pair dedup. Wall time is the recurring cost of a deployed PQ stream;
    // state rows = emitted pairs inside the watermark horizon.
    val (pqProbeSec, pqProbeStateRows) = try {
      val tbl = graft.llm.Pq.ensurePqIndex(spark, sfDir)
      graft.Checkpoints.releaseAll()
      val sdir = scratch("graft-bench-pq-probe")
      import org.apache.spark.sql.functions.{col, lit, to_timestamp}
      Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"),
          to_timestamp(lit("2026-01-01 00:00:00")).as("arrived"))
        .coalesce(1).write.mode("overwrite").parquet(sdir.toString)
      val schema = spark.read.parquet(sdir.toString).schema
      var stateRows = 0.0
      def run(): Unit = {
        val cp = scratch("graft-bench-pq-probe-cp")
        val stream = spark.readStream.schema(schema).parquet(sdir.toString)
        val q = graft.streaming.StreamOps.pqProbeStream(spark, tbl, stream, "arrived")
          .writeStream.format("noop").option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] pq probe stream row failed: $e"); (-1.0, -1.0)
    }
    // r10 streaming e2e row: the lexical-tier serving probe — query docs
    // stream against the PERSISTED inverted index (built in the untimed
    // warmup), rare-term gated, impact-radius cut, watermarked pair
    // dedup. State rows = emitted pairs inside the horizon.
    val (lexProbeSec, lexProbeStateRows) = try {
      val tbl = graft.llm.Lexical.ensureLexIndex(spark, sfDir)
      graft.Checkpoints.releaseAll()
      val sdir = scratch("graft-bench-lex-probe")
      import org.apache.spark.sql.functions.{col, lit, to_timestamp}
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"),
          to_timestamp(lit("2026-01-01 00:00:00")).as("arrived"))
        .coalesce(1).write.mode("overwrite").parquet(sdir.toString)
      val schema = spark.read.parquet(sdir.toString).schema
      var stateRows = 0.0
      def run(): Unit = {
        val cp = scratch("graft-bench-lex-probe-cp")
        val stream = spark.readStream.schema(schema).parquet(sdir.toString)
        val q = graft.streaming.StreamOps.lexRadiusStream(spark, tbl, stream, "arrived")
          .writeStream.format("noop").option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] lex radius stream row failed: $e"); (-1.0, -1.0)
    }
    // r11 streaming e2e row: the lexical RANKING probe — query docs stream
    // against the persisted inverted index (warm, pay-at-ingest) and each
    // micro-batch ranks its arrivals through the exact batch probe plan
    // (foreachBatch; the only stream state is the watermark query dedup).
    // Wall time is the recurring cost of a deployed lexical search stream.
    val (lexTopkSec, lexTopkStateRows) = try {
      val tbl = graft.llm.Lexical.ensureLexIndex(spark, sfDir)
      graft.Checkpoints.releaseAll()
      val sdir = scratch("graft-bench-lex-topk")
      import org.apache.spark.sql.functions.{col, lit, to_timestamp}
      Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text"),
          to_timestamp(lit("2026-01-01 00:00:00")).as("arrived"))
        .coalesce(1).write.mode("overwrite").parquet(sdir.toString)
      val schema = spark.read.parquet(sdir.toString).schema
      var stateRows = 0.0
      def run(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(sdir.toString)
        val q = graft.streaming.StreamOps
          .lexTopkStream(spark, tbl, stream, "arrived") { ranked =>
            ranked.write.format("noop").mode("overwrite").save()
          }
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] lex topk stream row failed: $e"); (-1.0, -1.0)
    }
    // r11 streaming e2e row: the vector RANKING probe — query vectors
    // stream against the persisted hyperplane-bucketed index (warm), each
    // micro-batch ranked through the exact batch probe plan.
    val (annTopkSec, annTopkStateRows) = try {
      val tbl = graft.sources.AnnIndexSink.ensureEmbeddingIndex(spark, sfDir)
      graft.Checkpoints.releaseAll()
      val sdir = scratch("graft-bench-ann-topk")
      import org.apache.spark.sql.functions.{col, lit, to_timestamp}
      Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"),
          to_timestamp(lit("2026-01-01 00:00:00")).as("arrived"))
        .coalesce(1).write.mode("overwrite").parquet(sdir.toString)
      val schema = spark.read.parquet(sdir.toString).schema
      var stateRows = 0.0
      def run(): Unit = {
        val stream = spark.readStream.schema(schema).parquet(sdir.toString)
        val q = graft.streaming.StreamOps
          .annTopkStream(spark, tbl, stream, "arrived") { ranked =>
            ranked.write.format("noop").mode("overwrite").save()
          }
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ann topk stream row failed: $e"); (-1.0, -1.0)
    }
    val (clickSec, clickStateRows) = try {
      val sdir = scratch("graft-bench-click")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        sdir.resolve("part-00000.parquet"))
      var stateRows = 0.0
      def run(): Unit = {
        val cp = scratch("graft-bench-click-cp")
        val ev = graft.streaming.StreamOps.readEventStream(spark, sdir.toString)
        val q = graft.streaming.StreamOps.clickAttributionStream(ev)
          .writeStream.format("noop").option("checkpointLocation", cp.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        stateRows = lastStateRows(q)
      }
      run()
      (bestOf3(() => run()), stateRows)
    } catch { case e: Throwable =>
      System.err.println(s"[bench] click attribution stream row failed: $e"); (-1.0, -1.0)
    }
    val calibStreamEnd = calibProbe()
    val reported = results :+ ("capex_bucketed_ctas" -> ctasSec) :+
      ("stream_sessionize_e2e" -> streamSec) :+
      ("stream_index_probe_e2e" -> probeSec) :+
      ("stream_index_probe_state_rows" -> probeStateRows) :+
      ("stream_pq_probe_e2e" -> pqProbeSec) :+
      ("stream_pq_probe_state_rows" -> pqProbeStateRows) :+
      ("stream_lex_radius_e2e" -> lexProbeSec) :+
      ("stream_lex_radius_state_rows" -> lexProbeStateRows) :+
      ("stream_lex_topk_e2e" -> lexTopkSec) :+
      ("stream_lex_topk_state_rows" -> lexTopkStateRows) :+
      ("stream_ann_topk_e2e" -> annTopkSec) :+
      ("stream_ann_topk_state_rows" -> annTopkStateRows) :+
      ("stream_click_attr_e2e" -> clickSec) :+
      ("stream_click_attr_state_rows" -> clickStateRows) :+
      ("calib" -> calibs.min) :+ ("calib_worst" -> calibs.max) :+
      ("calib_stream" -> math.min(calibStreamStart, calibStreamEnd)) :+
      ("calib_stream_worst" -> math.max(calibStreamStart, calibStreamEnd))
    val qs = reported.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // failed rows (sentinel -1.0) stay visible per-query but must not
    // deflate the round-over-round total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
