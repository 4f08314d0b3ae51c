package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.PartitionedSink

/** Proves the partition-pruning claim with plan internals: a filter on the
  * partition column reaches the scan as a PartitionFilter and the scan's
  * selected-partition count shrinks to the matching slice — zero bytes of
  * the other partitions are read.
  */
class PartitioningSpec extends SparkSpecBase {

  private val path = "/tmp/graft-test-partitioned/documents"

  private def ensureWritten(): Unit = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_SUCCESS")))
      PartitionedSink.writePartitioned(
        Tables.documents(spark, sfDir), path, Seq("lang"))
  }

  test("lang filter prunes the scan to one partition directory") {
    ensureWritten()
    val nLangs = Tables.documents(spark, sfDir)
      .select("lang").distinct().count().toInt

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get

    val all = PartitionedSink.readPartitioned(spark, path)
    assert(scanOf(all).selectedPartitions.partitionCount == nLangs)

    val en = all.filter(col("lang") === "en")
    val scan = scanOf(en)
    // the filter became a partition-directory filter, not a row filter
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      scan.partitionFilters.mkString(", "))
    assert(scan.selectedPartitions.partitionCount == 1)
  }

  test("partitioned round-trip preserves rows and the partition column") {
    ensureWritten()
    val src = Tables.documents(spark, sfDir)
    val back = PartitionedSink.readPartitioned(spark, path)
    assert(back.count() == src.count())
    val a = back.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = src.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    // doc_ids survive the reshuffle into directories
    assert(back.select("doc_id").exceptAll(src.select("doc_id")).count() == 0)
  }
}
