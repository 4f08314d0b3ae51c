package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.llm.{Corpus, Dedup}
import graft.sources.IndexSink

/** The r8 D-family flagship (corpus_pipeline) and its persisted-index twin:
  * the full clean → mixture → BPE-pack assembly must be non-vacuous at spec
  * scale (every stage provably filters or transforms something), the twin
  * must be row-identical (its stored band rows are the recompute's
  * expressions verbatim), and the twin's pair stage must actually consume
  * the bucketed band_key layout — zero join-key exchanges where the
  * recompute form pays them.
  */
class CorpusPipelineSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.mkString("|")).toSet

  test("pipeline is non-vacuous: every stage moves something at spec scale") {
    val out = Corpus.corpusPipeline(spark, sfDir)
    val n = out.count()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(n > 0, "flagship produced no rows")
    assert(n < nDocs, "cleaning+mixture dropped nothing — composition vacuous")
    // packing genuinely assigned multi-doc sequences: some seq_id holds
    // more than one doc (the concat-then-chunk layout is active)
    assert(out.groupBy(col("shard"), col("seq_id")).count()
      .filter(col("count") > 1).count() > 0, "packing never packed")
    // the manifest's quality floor holds
    assert(out.filter(col("quality_score") < Corpus.QualityFloor).count() === 0L)
    Checkpoints.releaseAll()
  }

  test("indexed twin is row-identical to the recompute flagship") {
    val a = rows(Corpus.corpusPipeline(spark, sfDir))
    Checkpoints.releaseAll()
    val b = rows(Corpus.corpusPipelineIndexed(spark, sfDir))
    Checkpoints.releaseAll()
    assert(a.nonEmpty && a == b)
  }

  test("index-served pairs == recompute pairs; index side exchange-free") {
    val table = IndexSink.ensureFullSignatureIndex(spark, sfDir)
    assert(rows(IndexSink.pairsFromIndex(spark, table)) ==
      rows(Dedup.dedupMinhash(spark, sfDir)))
    Checkpoints.releaseAll()
    // plan proof, broadcast off so the join keeps both sides' layouts
    // visible: the stored self-join pays ZERO band_key exchanges (both
    // sides scan the bucketed table), while the recompute form pays them
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps executed exchanges in query stages — disable so the plan
    // walk sees ShuffleExchangeExec directly (the AnnIndexSpec pattern)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def bandShuffles(df: org.apache.spark.sql.DataFrame) = {
        df.collect()
        df.queryExecution.executedPlan
          .collect { case e: ShuffleExchangeExec => e }
          .filter(e => e.outputPartitioning.toString.contains("band_key") ||
            e.outputPartitioning.toString.contains("band_hash"))
      }
      assert(bandShuffles(IndexSink.pairsFromIndex(spark, table)).isEmpty,
        "index-served pair join re-shuffled on the band key")
      assert(bandShuffles(Dedup.dedupMinhash(spark, sfDir)).nonEmpty,
        "recompute twin unexpectedly exchange-free (test is vacuous)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
    Checkpoints.releaseAll()
  }

  test("incremental flagship is row-identical to the full recompute (r12)") {
    val full = Corpus.corpusPipeline(spark, sfDir)
    val inc = Corpus.corpusPipelineIncremental(spark, sfDir)
    assert(rows(inc) == rows(full))
    // incrementality is real: both batch and corpus slices are non-empty
    // at spec scale, and BOTH contribute rows to the output
    val m = Dedup.IncrementalBatchMod
    val bysSide = inc.groupBy((col("doc_id") % m === 0).as("is_batch")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(bysSide.getOrElse(true, 0L) > 0 && bysSide.getOrElse(false, 0L) > 0)
    // warm state: a second run finds the persisted tables (no rebuild)
    val stateTbl = Corpus.ensureCorpusState(spark, sfDir)
    assert(spark.catalog.tableExists(stateTbl) &&
      spark.catalog.tableExists(stateTbl + "_bench"))
  }

  test("mixture rates in the pipeline come from the CLEANED mass") {
    // a language whose mass is entirely near-dup droppable would get a
    // different keep rate against raw vs cleaned totals; assert the
    // pipeline's survivors all pass the mixture bucket filter computed on
    // cleaned mass — i.e. re-deriving the rate table from corpus_clean's
    // survivors reproduces the pipeline's selection exactly
    val kept = Corpus.corpusClean(spark, sfDir)
    val cleanedDocs = Tables.documents(spark, sfDir)
      .join(kept.select("doc_id"), Seq("doc_id"), "left_semi")
    val expectedSel = graft.llm.Sampling.corpusMixtureOf(cleanedDocs)
      .select(col("doc_id"))
    val out = Corpus.corpusPipeline(spark, sfDir).select(col("doc_id"))
    assert(rows(out) == rows(
      expectedSel.join(kept.select(col("doc_id")), Seq("doc_id"), "left_semi")))
    Checkpoints.releaseAll()
  }
}
