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

  test("probe join: the index side of the SMJ contributes no Exchange") {
    ensureIndex()
    // force the shuffled-join path (a broadcast would hide the question);
    // AQE off so executedPlan is the concrete tree we can walk
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.execution.joins.SortMergeJoinExec
      val exec = IndexSink.probe(spark, "sig_index", batchBands)
        .queryExecution.executedPlan
      val plan = exec.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "index scan must report its bucket layout:\n" + plan.take(800))
      val smj = exec.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "shuffled probe should be a sort-merge join:\n" + plan.take(800))
      def hasIndexScan(p: SparkPlan): Boolean = p.collectLeaves().exists {
        case f: FileSourceScanExec => f.tableIdentifier.exists(_.table == "sig_index")
        case _ => false
      }
      val indexSides = Seq(smj.get.left, smj.get.right).filter(hasIndexScan)
      assert(indexSides.nonEmpty, "no join side reads sig_index:\n" + plan.take(800))
      // the load-bearing §5 claim, asserted on the exact edge: the bucketed
      // index scan satisfies the join's required distribution, so the
      // multi-TB index side carries NO Exchange — only the (small) incoming
      // batch side shuffles
      indexSides.foreach { side =>
        assert(side.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "index side of the probe join re-shuffled:\n" + side.toString.take(1200))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
    Checkpoints.releaseAll()
  }
}
