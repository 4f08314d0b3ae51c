package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regression guard: the scale properties SURVEY §5 claims —
  * broadcast dim joins, scan-level filter pushdown, column pruning — are
  * asserted against the actual physical plans so a refactor can't silently
  * trade them away.
  */
class PlanAuditSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q3/q5: dim edges broadcast, no sort-merge join") {
    for (df <- Seq(queries.Analytics.q3Join(spark, sfDir),
                   queries.Analytics.q5MultiJoin(spark, sfDir))) {
      val p = planOf(df)
      assert(p.contains("BroadcastHashJoin"), "expected broadcast dim join")
      assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge")
    }
  }

  test("q6: selective filters reach the parquet scan") {
    val p = planOf(queries.Analytics.q6Filter(spark, sfDir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("text_tokens: scan prunes to the two needed columns") {
    val p = planOf(llm.TextOps.textTokens(spark, sfDir))
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("text"), read)
    assert(!read.contains("n_chars") && !read.contains("lang"), read)
  }

  test("capex build plans: dims broadcast, no cartesian or sort-merge joins") {
    // raw: the customer/nation dim joins
    val pr = planOf(capex.CapexDerive.raw(spark, sfDir))
    assert(pr.contains("BroadcastHashJoin"), "raw dim joins must broadcast")
    assert(!pr.contains("CartesianProduct") && !pr.contains("SortMergeJoin"), pr.take(400))
    // the enriched build: dictionary joins back onto the fact (the zone
    // fallback's broadcast nested loop sits inside the withCats checkpoint,
    // so this plan shows the flag-dictionary joins)
    val pe = planOf(capex.CapexDerive.buildEnriched(spark, sfDir))
    assert(pe.contains("BroadcastHashJoin"), "dict joins must broadcast")
    assert(!pe.contains("CartesianProduct"), "fact-side cartesian join")
    assert(!pe.contains("SortMergeJoin"), "dict join degraded to sort-merge")
    capex.CapexDerive.clearCache()
  }

  test("ann_bruteforce: query side broadcast, corpus never shuffled wide") {
    val p = planOf(llm.Ann.annBruteforce(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), "query set must broadcast")
    assert(p.contains("float_vec_dot"), "native dot expression must be in the plan")
  }

  test("dedup_embedding: bucketed candidate join, never all-pairs") {
    val p = planOf(llm.Ann.dedupEmbedding(spark, sfDir))
    assert(!p.contains("CartesianProduct"), "corpus self-cartesian crept back in")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate join must be an equality join on (band_idx, band_key)")
    Checkpoints.releaseAll()
  }

  test("dedup_semantic: pair join keyed by cell, never all-pairs") {
    val p = planOf(llm.Ann.dedupSemantic(spark, sfDir))
    assert(!p.contains("CartesianProduct"), "within-cell join degraded to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate join must be an equality join on cell")
    Checkpoints.releaseAll()
  }

  test("text_lm_score: scoring pass is map-only over the code barrier") {
    // pass 1 (bounded alphabet² aggregate) runs at construction; the plan
    // the engine executes per-corpus is the scoring fold — a projection
    // over the checkpointed code arrays with the probability table baked
    // as an array literal: no join, no exchange, no aggregate
    val p = planOf(llm.TextOps.textLmScore(spark, sfDir))
    assert(!p.contains("Join") && !p.contains("Exchange") &&
      !p.contains("HashAggregate"), p.take(700))
    Checkpoints.releaseAll()
  }

  test("split_holdout: AQE broadcasts the small membership side at runtime") {
    // no hard hint (a heavily-duplicated crawl's membership table must not
    // OOM a broadcast) — the property is that AQE's runtime sizing picks
    // the broadcast join when membership genuinely fits
    val df = llm.Sampling.splitHoldout(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(600))
    Checkpoints.releaseAll()
  }

  test("text_redact_pii: map-only plan — no join, window or aggregate") {
    val p = planOf(llm.TextOps.textRedactPii(spark, sfDir))
    assert(!p.contains("Join") && !p.contains("Window") && !p.contains("HashAggregate"),
      p.take(600))
  }

  test("pack_sequences: one window clustered by shard, no join") {
    val p = planOf(llm.Packing.packSequences(spark, sfDir))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window.*""")) == 1, p.take(600))
    assert(!p.contains("Join"), "packing must not join")
    // exchanges: at most the narrow-scan spread + the window's shard
    // clustering (the former disappears on a pre-split cluster scan)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) <= 2, p.take(600))
  }

  test("text_repetition: aggregates are partial (map-side) before their exchange") {
    val p = planOf(llm.TextOps.textRepetition(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange")
    assert(aggs.size >= 2 && exchs.nonEmpty && aggs.min < exchs.min, p.take(600))
  }

  test("decontaminate: benchmark index broadcast, corpus never self-joined wide") {
    val p = planOf(llm.Dedup.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "bench shingle index must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(600))
    Checkpoints.releaseAll()
  }

  test("asof_join: exactly one Window, no join operator at all") {
    val p = planOf(queries.Temporal.asofJoinQ(spark, sfDir))
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window.*""")) == 1, p.take(600))
    assert(!p.contains("Join"), "as-of must be the windowed-union form, not a join")
  }

  test("embed_centroids: aggregate is partial (map-side) before its exchange") {
    val p = planOf(llm.Ann.embedCentroids(spark, sfDir))
    // the partial aggregate must execute BEFORE the exchange (formatted
    // explain numbers nodes leaf-first) so the shuffle carries label×dim
    // partial sums, not exploded vector elements
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange")
    assert(aggs.size >= 2 && exchs.nonEmpty && aggs.min < exchs.min, p.take(600))
  }

  test("sample_stratified: stateless map-side filter, zero exchanges") {
    val p = planOf(llm.Sampling.sampleStratified(spark, sfDir))
    assert(!p.contains("Exchange"), p.take(600))
  }

  test("dedup_incremental: AQE broadcasts the small batch side at runtime") {
    // no hard broadcast hint in the query (a spiking crawl must not OOM) —
    // the property is that AQE's runtime sizing picks the broadcast join
    // when the batch genuinely fits, so audit the ADAPTIVE executed plan
    val df = llm.Dedup.dedupIncremental(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(600))
    Checkpoints.releaseAll()
  }

  test("sample_cap_domain: two bounded windows with rank-limit pushdown, no join") {
    val p = planOf(llm.Sampling.sampleCapDomain(spark, sfDir))
    // exactly the two phase windows (not counting WindowGroupLimit nodes)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Window( \[.*)?""")) == 2, p.take(600))
    // Spark pushes the rank()<=K filter below the shuffle as WindowGroupLimit,
    // so each reducer receives at most K rows per (group, salt) — assert the
    // optimization actually fired (it is the cap's second scale lever)
    assert(p.contains("WindowGroupLimit"), "rank-limit pushdown missing")
    assert(!p.contains("Join"), "cap must not join")
  }

  test("corpus_mixture: language rate table broadcast back over the scan") {
    val p = planOf(llm.Sampling.corpusMixture(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "rate table must broadcast")
    assert(!p.contains("SortMergeJoin"), p.take(600))
  }

  test("decontaminate_bloom: sketch probe is a scalar subquery, no corpus-wide join before it") {
    val p = planOf(llm.Dedup.decontaminateBloom(spark, sfDir))
    // the probe made it into the physical plan as the codegen'd predicate
    assert(p.contains("might_contain"), p.take(800))
    // the sketch reaches the filter as a one-row subquery, not a join edge
    assert(p.contains("Subquery") || p.contains("scalar-subquery"), p.take(800))
    // candidate confirmation stays broadcast; the corpus is never cartesian'd
    assert(p.contains("BroadcastHashJoin"), "exact confirm must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(800))
    Checkpoints.releaseAll()
  }

  test("events_rolling and scd2: one exchange (the user clustering), windows reuse it") {
    for (df <- Seq(queries.Events.eventsRolling(spark, sfDir),
                   queries.Events.scd2Intervals(spark, sfDir))) {
      val p = planOf(df)
      assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange( .*)?""")) == 1, p.take(700))
      assert(!p.contains("Join"), "window ops must not join")
    }
  }

  test("hop_window_agg: map-side slot expansion (Generate), one partial-agg shuffle") {
    val p = planOf(queries.Events.hopWindowAgg(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(ids("Generate").nonEmpty, "slot explode must be a Generate")
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange")
    // partial agg sits between the explode and the (single agg) exchange
    assert(aggs.size >= 2, "expected partial+final agg")
    assert(!p.contains("Join"), "hop expansion must not join")
  }

  test("agg_incremental: merge input is two aggregates, not a history rescan") {
    val p = planOf(queries.Events.aggIncremental(spark, sfDir))
    // the stored side arrives as a materialized checkpoint (LogicalRDD
    // scan), not a re-aggregation of the raw events scan
    assert(p.contains("Scan ExistingRDD"), "stored aggregate must be materialized")
    assert(!p.contains("Join"), "merge is a union+agg, not a join")
    Checkpoints.releaseAll()
  }

  test("corpus_report: one scan, no self-join of derived frames") {
    val p = planOf(llm.Corpus.corpusReport(spark, sfDir))
    assert(!p.contains("Join"), "per-doc features must be one projection")
    // the rank and count windows must SHARE one (source, lang) exchange
    // (plus at most the narrow-scan spread upstream of it)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange( .*)?""")) <= 2, p.take(700))
  }

  test("events_salted_join: right side replicated via Generate, no broadcast of the fact") {
    val p = planOf(queries.Temporal.eventsSaltedJoin(spark, sfDir))
    assert(p.contains("Generate"), "salt replication must be a Generate")
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("mm_resize: map-only plan, zero exchanges over a pre-split input") {
    // simulate a cluster scan: a multi-file parquet directory arrives with
    // >= cores/2 splits, so spreadIfNarrow must be a no-op and the resize
    // stays a pure projection — no shuffle of the binary payload column
    val dir = java.nio.file.Files.createTempDirectory("graft-presplit").toString
    Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = planOf(llm.Multimodal.mmResize(spark, dir))
    assert(!p.contains("Exchange"), p.take(700))
    assert(!p.contains("Join"), "resize must be a projection")
  }

  test("q1_rollup: single-pass grouping-sets expand, partial agg before its exchange") {
    val p = planOf(queries.Analytics.q1Rollup(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange"); val exp = ids("Expand")
    // expand feeds the partial aggregate, which executes before the agg's
    // own shuffle (the LAST exchange — the first may be the local narrow-scan
    // spread, which a pre-split cluster scan doesn't have)
    assert(exp.nonEmpty, "rollup must expand grouping sets, not rescan")
    assert(aggs.size >= 2 && exchs.nonEmpty, p.take(600))
    assert(exp.min < aggs.min && aggs.min < exchs.max, p.take(600))
  }

  test("events_anomaly: stats table broadcasts back, no sort-merge or window") {
    val p = planOf(queries.Behavior.eventsAnomaly(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "5-row stats table must broadcast")
    assert(!p.contains("SortMergeJoin"), "scoring join degraded to sort-merge")
    // scoring must not be a window partitioned by the 5-value event_type
    assert(!p.contains("Window"), "z-scoring must be a broadcast join, not a window")
  }

  test("events_throttle: the lag window reuses the repartition's clustering") {
    val p = planOf(queries.Behavior.eventsThrottle(spark, sfDir))
    // exactly one exchange: the explicit (user_id, event_type) repartition;
    // the window's required clustering is satisfied by it
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange( .*)?""")) == 1, p.take(700))
    assert(p.contains("Window"), "throttle is a lag window")
  }

  test("text_ngram_freq: top-N via TakeOrderedAndProject, never a global sort") {
    val p = planOf(llm.TextOps.textNgramFreq(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    Checkpoints.releaseAll()
  }

  test("sample_exact_n: TakeOrderedAndProject, never a global sort") {
    val p = planOf(llm.Sampling.sampleExactN(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
  }

  test("part_pagerank: keyed joins only — no cartesian, no broadcast of the fact") {
    val p = planOf(queries.Graph.partPagerank(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(700))
    Checkpoints.releaseAll()
  }

  test("table_stats: two aggregate passes, no grouping-set Expand of wide rows") {
    val p = planOf(queries.Profile.tableStats(spark, sfDir))
    // the 11-row base/ndv join must broadcast, never shuffle
    assert(!p.contains("SortMergeJoin"),
      "the 11-row base/ndv join must not shuffle")
    val read = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && read.contains("l_shipdate"), read)
  }

  test("fk_integrity: ONE pruned scan per child table, keyed joins only") {
    val p = planOf(queries.Profile.fkIntegrity(spark, sfDir))
    assert(!p.contains("CartesianProduct"), "FK probes must stay keyed")
    assert(!p.contains("BroadcastNestedLoopJoin"), "FK probes must stay keyed")
    // the r7 contract: lineitem is scanned ONCE (its 3 FK columns stacked
    // map-side), not once per relationship — the 100 TB dominant cost
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    val liReads = reads.filter(_.contains("l_"))
    assert(liReads.size == 1, "lineitem must be scanned exactly once:\n" +
      liReads.mkString("\n"))
    assert(liReads.head.contains("l_orderkey") && liReads.head.contains("l_partkey")
      && liReads.head.contains("l_suppkey"), liReads.head)
    assert(!liReads.head.contains("l_extendedprice") && !liReads.head.contains("l_comment"),
      liReads.head)
    // the child side pre-aggregates (rel, key) BEFORE its exchange so the
    // shuffle carries ~distinct FK values, not child rows
    val aggFirst = """\((\d+)\) HashAggregate""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val exchFirst = """\((\d+)\) Exchange""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    assert(aggFirst.size >= 2 && exchFirst.nonEmpty && aggFirst.min < exchFirst.max,
      p.take(700))
  }

  test("mixture_epochs: no corpus-sized join — one aggregate plus a 1-row total") {
    val p = planOf(llm.Sampling.mixtureEpochs(spark, sfDir))
    // the only join is the broadcast of the single-row totals frame
    assert(!p.contains("SortMergeJoin"), "totals must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "1-row cross join must be broadcast-shaped")
  }

  test("embed_quantize: map-only plan, zero exchanges over a pre-split input") {
    val dir = java.nio.file.Files.createTempDirectory("graft-presplit-emb").toString
    Tables.embeddings(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val p = planOf(llm.Ann.embedQuantize(spark, dir))
    assert(!p.contains("Exchange"), p.take(700))
    assert(!p.contains("Join"), "quantization must be a projection")
  }

  test("funnel_steps: stage joins stay keyed, no cartesian") {
    val p = planOf(queries.Behavior.funnelSteps(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), "stage joins must be equality joins")
  }

  test("events_winsorize: thresholds broadcast back, fact never type-sorted") {
    val p = planOf(queries.Behavior.eventsWinsorize(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "per-type thresholds must broadcast")
    assert(!p.contains("SortMergeJoin"), "clamp join degraded to sort-merge")
  }

  test("unpivot_lineitem: map-side Expand, zero exchanges") {
    val p = planOf(queries.Analytics.unpivotLineitem(spark, sfDir))
    assert(p.contains("Expand"), "unpivot must plan as Expand")
    assert(!p.contains("Exchange"), p.take(600))
    assert(!p.contains("Union"), "unpivot must not rescan per measure")
  }

  test("merge_upsert: one keyed full-outer apply, no cartesian") {
    val p = planOf(queries.Merge.mergeUpsert(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), "merge must join on the key")
    assert(p.contains("FullOuter"), "CDC apply is a full-outer key join")
  }

  test("snapshot_diff: keyed joins only, no cartesian") {
    val p = planOf(queries.Merge.snapshotDiff(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), "diff must join on the key")
    assert(p.contains("FullOuter"), "diff is a full-outer key join")
  }

  test("events_twap: the lead window reuses the spread's user clustering") {
    val p = planOf(queries.Events.eventsTwap(spark, sfDir))
    // the explicit user spread feeds BOTH the window and the per-user agg:
    // no second wide exchange of the facts
    assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange( .*)?""")) <= 1, p.take(700))
    assert(p.contains("Window"), "twap is a lead window")
  }

  test("events_gap_fill / retention: keyed equality joins only") {
    for (df <- Seq(queries.Events.eventsGapFill(spark, sfDir),
                   queries.Behavior.retentionCohorts(spark, sfDir))) {
      val p = planOf(df)
      assert(!p.contains("CartesianProduct"), p.take(600))
      assert(!p.contains("BroadcastNestedLoopJoin"), "span/first-seen joins must be keyed")
    }
  }

  test("basket_pairs: user-keyed self-join; only the 1-row total broadcasts wide") {
    val p = planOf(queries.Behavior.basketPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.take(600))
    // the single permitted nested-loop join is the broadcast of the 1-row
    // population count onto the bounded pair table
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin( .*)?""")) <= 1, p.take(700))
  }

  test("events_trend: one partial-agg shuffle, no sort, no join") {
    val p = planOf(queries.Behavior.eventsTrend(spark, sfDir))
    assert(p.contains("partial"), "sufficient stats must combine map-side")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("CartesianProduct"), "trend must be join-free")
    assert(!p.linesIterator.exists(_.matches("""\(\d+\) Sort( .*)?""")),
      "no per-type sort of the facts")
  }

  test("part_triangles: equality joins only — no cartesian, no BNLJ, no static broadcast") {
    val df = queries.Graph.partTriangles(spark, sfDir)
    val p = planOf(df)
    assert(!p.contains("CartesianProduct"), "wedge join degraded to cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "closing join must be equality")
    // the degree table has one row per graph NODE — it scales with the part
    // catalog, so a static broadcast hint on it is the §5 anti-pattern (the
    // r4 scale-killer): no hint may survive anywhere in this plan; AQE
    // sizes the deg joins at runtime
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    assert(df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.isEmpty,
      "static join hint on a data-scaled side")
    Checkpoints.releaseAll()
  }

  test("importance_weights: scoring pass is join-free over the barrier") {
    val p = planOf(llm.Sampling.importanceWeights(spark, sfDir))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("CartesianProduct"),
      "per-doc scoring must fold over the baked literal, never join")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan")
      || !p.contains("Exchange"), "no exchange beyond the barrier")
    Checkpoints.releaseAll()
  }

  test("text_normalize: map-only plan, zero exchanges over a pre-split input") {
    val dir = java.nio.file.Files.createTempDirectory("graft-presplit-norm").toString
    Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val p = planOf(llm.TextOps.textNormalize(spark, dir))
    assert(!p.contains("Exchange"), p.take(700))
    assert(!p.contains("Join"), "normalization must be a projection")
  }

  test("length_buckets: one partial-agg exchange, edge-bounded aggregate") {
    val p = planOf(llm.TextOps.lengthBuckets(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange")
    // partial aggregate runs BEFORE the bucket-key exchange (map-side
    // combine shrinks the shuffle to <= edges x maps rows)
    assert(aggs.size >= 2 && exchs.nonEmpty && aggs.min < exchs.max, p.take(600))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(600))
  }

  test("source_top_ngrams: rank window runs over the aggregated table") {
    val p = planOf(llm.Corpus.sourceTopNgrams(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val wins = ids("Window")
    // the (source, shingle) aggregate executes before the window sees rows:
    // lower formatted-plan ids are deeper, so the agg ids sit BELOW the window
    assert(aggs.nonEmpty && wins.nonEmpty && aggs.max < wins.min,
      "rank window must consume the aggregate, not raw shingles: " + p.take(600))
    assert(!p.contains("CartesianProduct"), p.take(600))
  }

  test("user_rfm: quartile maps broadcast back; facts never sort-merge") {
    val p = planOf(queries.Behavior.userRfm(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "value->quartile maps must broadcast")
    assert(!p.contains("SortMergeJoin"), p.take(700))
    Checkpoints.releaseAll()
  }

  test("corpus_temperature: rate table broadcast back, corpus never sorted") {
    val p = planOf(llm.Sampling.corpusTemperature(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "source rate table must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("Window"), "rates come from an aggregate, not a window")
  }

  test("mm_dedup: digest-keyed partial agg before its exchange; payload never shuffled") {
    val p = planOf(llm.Multimodal.mmDedup(spark, sfDir))
    def ids(name: String): Seq[Int] =
      s"""\\((\\d+)\\) $name\\b""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
    val aggs = ids("HashAggregate"); val exchs = ids("Exchange")
    // map-side combine shrinks the shuffle to digests before the exchange
    assert(aggs.size >= 2 && exchs.nonEmpty && aggs.min < exchs.max, p.take(600))
    // the binary payload column must not survive into the exchange: only
    // the digest travels (ReadSchema may read text, but the shuffle's
    // aggregate keys are the md5 output)
    assert(!p.contains("Join"), "content-hash dedup must not join")
  }

  test("bounded windows: every unpartitioned window consumes a post-aggregate table") {
    // quality_tiers / skew_report / user_rfm / quality_floor_lang run
    // Window.orderBy with NO partition spec — safe only because the window
    // input is a contract-bounded aggregate (quantized frequency table /
    // top-K cut), never the raw facts. This makes that contract executable:
    // every Window node must sit ABOVE a HashAggregate or
    // TakeOrderedAndProject (formatted-plan ids number leaf-first, so the
    // bounded producer's id must be smaller). A refactor that slides a
    // single-partition window onto the un-aggregated corpus fails here
    // before it ever OOMs a reducer at scale.
    for (df <- Seq(llm.Corpus.qualityTiers(spark, sfDir),
                   queries.Temporal.skewReport(spark, sfDir),
                   queries.Behavior.userRfm(spark, sfDir),
                   llm.Corpus.qualityFloorLang(spark, sfDir))) {
      val p = planOf(df)
      def ids(name: String): Seq[Int] =
        s"""\\((\\d+)\\) $name\\b""".r.findAllMatchIn(p).map(_.group(1).toInt).toSeq
      val wins = ids("Window")
      val bounded = ids("HashAggregate") ++ ids("SortAggregate") ++
        ids("ObjectHashAggregate") ++ ids("TakeOrderedAndProject")
      assert(wins.nonEmpty, "expected a window in the plan:\n" + p.take(400))
      wins.foreach { w =>
        assert(bounded.exists(_ < w),
          s"Window($w) has no bounded producer below it:\n" + p.take(700))
      }
      Checkpoints.releaseAll()
    }
  }

  test("positional-index probes never tokenize: no regex extraction, no posexplode of the corpus") {
    // the pay-at-ingest claim as a plan property (r11): the persisted
    // phrase probes must consume STORED position rows — a regression that
    // silently re-tokenizes (regexp_extract_all) or re-explodes the
    // corpus per query would keep the rows identical while re-paying the
    // ingest cost at serve time, which only the plan can catch
    val tbl = llm.Lexical.ensureLexPosIndex(spark, sfDir)
    for (df <- Seq(llm.Lexical.lexPhraseFromStore(spark, tbl),
                   llm.Lexical.lexPhraseSlopFromStore(spark, tbl))) {
      val p = planOf(df)
      // r12: the tokenizer is the native graft_tokens kernel; the regex
      // spelling stays covered so a revert can't dodge the audit
      assert(!p.contains("regexp_extract_all") && !p.contains("graft_tokens"),
        "warm phrase probe re-tokenized the corpus:\n" + p.take(500))
      assert(!p.contains("posexplode"),
        "warm phrase probe re-exploded positions:\n" + p.take(500))
      assert(p.contains("BroadcastHashJoin"),
        "phrase side must broadcast into the position rows")
    }
    // and the live form (the recompute twin) DOES tokenize — the contrast
    // that proves the assertion bites
    val live = planOf(llm.Lexical.lexicalPhraseK(spark, sfDir))
    assert(live.contains("graft_tokens") || live.contains("regexp_extract_all"))
  }
}
