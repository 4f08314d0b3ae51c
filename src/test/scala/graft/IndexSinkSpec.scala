package graft

import org.apache.spark.sql.functions._
import graft.llm.Dedup
import graft.sources.IndexSink

/** The persisted-signature-index sink: probe results must match
  * dedup_incremental's in-flight computation exactly, and the probe join
  * must read the index bucket-partitioned — no index-side Exchange.
  */
class IndexSinkSpec extends SparkSpecBase {

  private def ensureIndex(): Unit = {
    if (spark.catalog.tableExists("sig_index")) return
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "sig_index")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    IndexSink.writeSignatureIndex(spark, sfDir, "sig_index", 4)
  }

  private def batchBands = Dedup.minhashSignatures(spark, sfDir)
    .filter(col("doc_id") % Dedup.IncrementalBatchMod === 0)

  test("stored-index probe matches dedup_incremental's dup counts") {
    ensureIndex()
    val probed = IndexSink.probe(spark, "sig_index", batchBands)
      .groupBy(col("batch_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Dedup.dedupIncremental(spark, sfDir)
      .filter(col("n_index_dups") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probed == expected)
    assert(probed.nonEmpty, "batch must contain near-dups of index docs")
    Checkpoints.releaseAll()
  }

  test("probe join leaves the index side exchange-free: one Exchange total") {
    ensureIndex()
    // force the shuffled-join path (a broadcast would hide the question)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = IndexSink.probe(spark, "sig_index", batchBands)
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      // two Exchanges at most: the batch side of the probe join + the
      // distinct's own pair-key aggregate; the index scan's bucket spec
      // satisfies the join's distribution — a non-bucketed index would
      // pay a third Exchange over the multi-TB signature table
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "index scan must report its bucket layout:\n" + plan.take(800))
      assert(exchanges <= 2, s"expected index side exchange-free:\n" + plan.take(1200))
      val joinIdx = plan.linesIterator.indexWhere(_.contains("SortMergeJoin"))
      assert(joinIdx >= 0, "shuffled probe should be a sort-merge join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    Checkpoints.releaseAll()
  }
}
